#!/usr/bin/env python
"""Recall evaluation: compare index configurations against exact f32 search
on the same corpus (the BASELINE "recall@k at equal memory" methodology).

Evaluates either the persisted collection (default) or a synthetic corpus:

  python scripts/eval_recall.py                      # persisted index
  python scripts/eval_recall.py --synthetic 100000   # 100K random rows
  python scripts/eval_recall.py --configs bf16,int8,bucketed,ivf --k 10

Prints one JSON line per configuration with recall@k and bytes per vector
(the memory side of the trade).

Reading the numbers: on clustered corpora the score gap between ranks k and
k+1 is tiny (~3e-4 at k=10), so recall differences under ~0.02 are near-tie
churn between equally-valid orderings, not retrieval quality.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="bf16,int8,bucketed,ivf")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="evaluate N synthetic clustered rows instead of the persisted index")
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--nprobe", type=int, default=8)
    args = ap.parse_args()

    import numpy as np

    from tpu_rag.index import FlatIndex, IVFIndex
    from tpu_rag.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)

    if args.synthetic:
        n, d = args.synthetic, args.d
        centers = rng.standard_normal((max(64, n // 256), d)).astype(np.float32)
        vecs = (centers[rng.integers(0, len(centers), n)]
                + 0.35 * rng.standard_normal((n, d)).astype(np.float32))
        ids = [str(i) for i in range(n)]
        docs = [""] * n
        metas = [{} for _ in range(n)]
    else:
        from tpu_rag.config import config_from_env
        from tpu_rag.engine import RagEngine

        engine = RagEngine(config_from_env())
        state = engine.index.state()
        vecs, ids = state["vectors"], state["ids"]
        docs, metas = state["documents"], state["metadatas"]
        n, d = vecs.shape
        if n < args.k:
            print(json.dumps({"error": f"corpus too small ({n} rows)"}))
            return

    q_rows = rng.integers(0, n, args.queries)
    queries = (vecs[q_rows]
               + 0.2 * rng.standard_normal((args.queries, d)).astype(np.float32))

    exact = FlatIndex(d, dtype="float32", use_pallas=False)
    exact.add(ids, vecs, docs, metas)
    truth = exact.search(queries, args.k)

    def recall_of(index) -> float:
        res = index.search(queries, args.k)
        return float(np.mean([
            len(set(a) & set(b)) / args.k for a, b in zip(truth.ids, res.ids)]))

    for cfg in args.configs.split(","):
        cfg = cfg.strip()
        if cfg == "bf16":
            idx = FlatIndex(d, dtype="bfloat16")
            bytes_per_vec = d * 2
        elif cfg == "int8":
            idx = FlatIndex(d, dtype="int8")
            bytes_per_vec = d + 4
        elif cfg == "bucketed":
            idx = FlatIndex(d, dtype="bfloat16", search_mode="bucketed")
            idx.pallas_min_rows = 0
            bytes_per_vec = d * 2
        elif cfg == "ivf":
            idx = IVFIndex(d, dtype="bfloat16", nprobe=args.nprobe)
            bytes_per_vec = d * 2  # plus centroid/padding overhead
        else:
            print(json.dumps({"config": cfg, "error": "unknown config"}))
            continue
        idx.add(ids, vecs, docs, metas)
        print(json.dumps({
            "config": cfg,
            "n": int(n), "d": int(d), "k": args.k,
            "recall_at_k": round(recall_of(idx), 4),
            "bytes_per_vector": bytes_per_vec,
            "vs_exact_f32_bytes": round(bytes_per_vec / (d * 4), 3),
        }), flush=True)


if __name__ == "__main__":
    main()

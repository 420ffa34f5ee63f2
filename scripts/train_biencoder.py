#!/usr/bin/env python
"""Fine-tune the bi-encoder with in-batch-negative contrastive training.

Not in the reference (inference-only) — this closes the train->serve loop:

  python scripts/train_biencoder.py --pairs pairs.jsonl --steps 200 \
      --out ckpts/biencoder
  EMBEDDING_WEIGHTS=ckpts/biencoder python scripts/build_index.py

pairs.jsonl: one {"q": "...", "d": "..."} JSON object per line (a query and
a matching document/passage). With no --pairs, synthetic pairs are derived
from the docs corpus (query = title+summary, doc = body text) — weak
supervision, but enough to adapt the embedder to the corpus vocabulary.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus_pairs(docs_dir: str) -> list[tuple[str, str]]:
    from tpu_rag.ingest.chunker import to_chunks

    pairs = []
    for fp in glob.glob(os.path.join(docs_dir, "**", "*.json"), recursive=True):
        try:
            data = json.load(open(fp, encoding="utf-8"))
        except Exception:
            continue
        for d in data if isinstance(data, list) else [data]:
            chunks = to_chunks(d, fp, docs_dir)
            title = d.get("title", "")
            summary = d.get("summary", "")
            for c in chunks[1:]:  # body sections as docs, title+summary as query
                pairs.append((f"{title} {summary}".strip(), c["text"]))
    return pairs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default=None, help="pairs.jsonl ({'q','d'} per line)")
    ap.add_argument("--out", required=True, help="orbax checkpoint output dir")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--tau", type=float, default=0.05)
    ap.add_argument("--mesh", default="", help='e.g. "data:4,model:2"')
    args = ap.parse_args()

    import numpy as np

    from tpu_rag.config import config_from_env
    from tpu_rag.models.biencoder import spec_for_model
    from tpu_rag.models.tokenizer import encode_batch, load_tokenizer
    from tpu_rag.parallel.mesh import mesh_from_spec
    from tpu_rag.train.contrastive import ContrastiveTrainer
    from tpu_rag.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = config_from_env()

    if args.pairs:
        pairs = []
        for line in open(args.pairs, encoding="utf-8"):
            if line.strip():
                rec = json.loads(line)
                pairs.append((rec["q"], rec["d"]))
    else:
        pairs = corpus_pairs(cfg.docs_dir)
    if len(pairs) < 2:
        print("need at least 2 training pairs")
        return
    print(f"{len(pairs)} training pairs")

    import jax
    from jax.sharding import Mesh

    if args.mesh:
        mesh = mesh_from_spec(args.mesh)
        if "model" not in mesh.axis_names:
            raise SystemExit("mesh must have axes data[,model], e.g. data:4,model:2")
    else:
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), axis_names=("data", "model"))

    spec = spec_for_model(cfg.embedding_model)
    tok = load_tokenizer(cfg.tokenizer_path, vocab_size=spec.vocab_size)
    trainer = ContrastiveTrainer(spec, mesh, lr=args.lr, tau=args.tau)

    rng = np.random.default_rng(0)
    b = args.batch
    for step in range(args.steps):
        idx = rng.integers(0, len(pairs), b)
        qs = [pairs[i][0] for i in idx]
        ds = [pairs[i][1] for i in idx]
        q_ids, q_mask = encode_batch(tok, qs, args.seq_len, batch=b)
        d_ids, d_mask = encode_batch(tok, ds, args.seq_len, batch=b)
        loss = trainer.train_step({"q_ids": q_ids, "q_mask": q_mask,
                                   "d_ids": d_ids, "d_mask": d_mask})
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {loss:.4f}", flush=True)

    out = os.path.abspath(args.out)
    trainer.save(out)
    print(f"saved checkpoint to {out}")
    print(f"use it: EMBEDDING_WEIGHTS={out} python scripts/build_index.py")


if __name__ == "__main__":
    main()

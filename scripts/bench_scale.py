#!/usr/bin/env python
"""Scale benchmarks for the search kernels (BASELINE.md configs #2/#4 scale).

Data is generated and normalized ON DEVICE (no host->device upload of the
corpus), so 10M-row configs run in seconds of setup. Prints one JSON line
per config.

Usage:
  python scripts/bench_scale.py --config flat-1m-bf16
  python scripts/bench_scale.py --config flat-10m-bf16 --paths xla
  python scripts/bench_scale.py --config flat-10m-int8
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "flat-100k-bf16": (100_000, "bfloat16"),
    "flat-1m-bf16": (1_000_000, "bfloat16"),
    "flat-10m-bf16": (10_000_000, "bfloat16"),
    "flat-10m-int8": (10_000_000, "int8"),
    "ivf-1m-bf16": (1_000_000, "bfloat16"),
    "encoder-minilm": (4096, "bfloat16"),   # ingest embed throughput
}


def _run_ivf(n, d, k, qbatch, args) -> None:
    """IVF build (on-device k-means) + nprobe sweep vs exact ground truth
    (BASELINE.md config #4 shape, 1M scale)."""
    import numpy as np
    import time as _t

    from tpu_rag.index import FlatIndex, IVFIndex

    # Clustered (mixture-of-Gaussians) data: uniform random high-dim vectors
    # have no cluster structure, which makes IVF recall trivially
    # nprobe/nlist; real embedding corpora cluster, so the benchmark models
    # that: n_centers centers, sigma controls cluster tightness.
    rng = np.random.default_rng(0)
    n_centers = 4096
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    assign0 = rng.integers(0, n_centers, n)
    vecs = centers[assign0] + 0.35 * rng.standard_normal((n, d)).astype(np.float32)
    ids = [str(i) for i in range(n)]
    # queries: near random corpus points (the realistic retrieval regime)
    probe_rows = rng.integers(0, n, qbatch)
    queries = vecs[probe_rows] + 0.2 * rng.standard_normal((qbatch, d)).astype(np.float32)

    exact = FlatIndex(d, dtype="bfloat16", use_pallas=False)
    exact.add(ids, vecs)
    truth = exact.search(queries, k)

    ivf = IVFIndex(d, dtype="bfloat16", nlist=int(2 * np.sqrt(n)), use_pallas=False)
    ivf.add(ids, vecs)
    t0 = _t.time()
    ivf.device_snapshot()  # k-means build + grouping + upload
    build_s = _t.time() - t0

    sweep = {}
    for nprobe in (1, 4, 8, 16, 32, 64):
        ivf.nprobe = nprobe
        res = ivf.search(queries, k)  # compile+run
        t0 = _t.perf_counter()
        iters = 10
        for _ in range(iters):
            res = ivf.search(queries, k)
        dt = (_t.perf_counter() - t0) / iters
        recall = float(np.mean([
            len(set(a) & set(b)) / k for a, b in zip(truth.ids, res.ids)]))
        sweep[nprobe] = {"ms": round(dt * 1000, 2),
                         "qps": round(qbatch / dt, 1),
                         "recall_at_10": round(recall, 4)}
    print(json.dumps({"config": args.config, "n": n, "d": d,
                      "nlist": ivf.nlist, "build_seconds": round(build_s, 1),
                      "nprobe_sweep": sweep}))


def _run_encoder(n, args) -> None:
    """MiniLM-class embed throughput (ingest build-time axis)."""
    import time as _t

    import numpy as np

    from tpu_rag.models.biencoder import BiEncoder

    enc = BiEncoder(batch=256, seq_len=256)
    texts = [f"document number {i} about topic {i % 97} with several words "
             f"of content repeated {' lorem ipsum' * 8}" for i in range(n)]
    enc.embed(texts[:256])  # compile
    t0 = _t.perf_counter()
    out = enc.embed(texts)
    dt = _t.perf_counter() - t0
    print(json.dumps({
        "config": args.config, "n": n,
        "model": "minilm-l6 (384d, seq 256, batch 256)",
        "texts_per_second": round(n / dt, 1),
        "seconds": round(dt, 2),
        "dim": int(out.shape[1]),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="flat-1m-bf16", choices=sorted(CONFIGS))
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--qbatch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--paths", default="xla,pallas,packed,bucketed")
    args = ap.parse_args()

    from tpu_rag.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_rag.ops import fused_matmul_topk, topk_xla_reference
    from tpu_rag.ops.quant import quantize_int8_rows
    from tpu_rag.ops.topk import default_block_n

    n, dtype = CONFIGS[args.config]
    d, k, qbatch = args.d, args.k, args.qbatch
    dtype_bytes = 1 if dtype == "int8" else 2
    bn = default_block_n(d, dtype_bytes, 8192)
    # packed/bucketed afford taller tiles (different VMEM budget) — pad the
    # corpus so EVERY mode runs at its own default tile height (capping the
    # packed tile at the exact bn would underreport it by ~2x)
    bn_tall = default_block_n(d, dtype_bytes, 4 * bn, "packed")
    unit = int(np.lcm(bn, bn_tall))
    n_pad = -(-n // unit) * unit

    if args.config.startswith("ivf"):
        _run_ivf(n, d, k, qbatch, args)
        return
    if args.config.startswith("encoder"):
        _run_encoder(n, args)
        return

    # ---- on-device data generation (chunked to bound peak memory)
    chunk = 1_000_000

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_chunk(key, rows):
        x = jax.random.normal(key, (rows, d), jnp.bfloat16)
        inv = jax.lax.rsqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1,
                                    keepdims=True) + 1e-9)
        return (x.astype(jnp.float32) * inv).astype(jnp.bfloat16)

    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(0), -(-n_pad // chunk))
    parts = []
    remaining = n_pad
    for key in keys:
        rows = min(chunk, remaining)
        c = gen_chunk(key, rows)
        if dtype == "int8":
            vals, scales = quantize_int8_rows(c.astype(jnp.float32))
            parts.append((vals, scales))
        else:
            parts.append(c)
        remaining -= rows
    if dtype == "int8":
        xj = jnp.concatenate([p[0] for p in parts])
        scales = jnp.concatenate([p[1] for p in parts])
    else:
        xj = jnp.concatenate(parts)
        scales = None
    del parts
    tags = jnp.zeros((n_pad,), jnp.int32)  # real rows; padding rows are extra
    # mark padding rows
    if n_pad > n:
        from tpu_rag.ops import PAD_TAG
        tags = tags.at[n:].set(PAD_TAG)
    qj = jax.random.normal(jax.random.PRNGKey(1), (qbatch, d), jnp.bfloat16)
    wants = jnp.array([[-1, -1]], jnp.int32)
    jax.block_until_ready(xj)
    gen_s = time.time() - t0

    def measure(run):
        sc, _ = run()
        np.asarray(sc)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            sc, _ = run()
        np.asarray(sc)
        dt = (time.perf_counter() - t0) / args.iters
        return dt

    paths = {}
    want_paths = set(args.paths.split(","))
    if "xla" in want_paths:
        fn = jax.jit(lambda q, xx, t, s: topk_xla_reference(
            q, xx, k, db_scales=s, ns_tags=t, canon_tags=t,
            want_ns=-1, want_canon=-1))
        paths["xla_fused"] = measure(lambda: fn(qj, xj, tags, scales))
    if "pallas" in want_paths:
        paths["pallas_fused"] = measure(lambda: fused_matmul_topk(
            qj, xj, k, db_scales=scales, ns_tags=tags, canon_tags=tags,
            wants=wants, assume_padded=True, block_n=bn))
    if "packed" in want_paths:
        # quasi-exact packed selection (ops/topk.py): the auto-mode serving
        # path for bf16/int8 corpora below the bucketed threshold
        paths["pallas_packed"] = measure(lambda: fused_matmul_topk(
            qj, xj, k, db_scales=scales, ns_tags=tags, canon_tags=tags,
            wants=wants, assume_padded=True, block_n=bn_tall, mode="packed"))
    if "bucketed" in want_paths:
        paths["pallas_bucketed"] = measure(lambda: fused_matmul_topk(
            qj, xj, k, db_scales=scales, ns_tags=tags, canon_tags=tags,
            wants=wants, assume_padded=True, block_n=bn_tall,
            mode="bucketed"))

    bytes_scanned = n * d * dtype_bytes
    print(json.dumps({
        "config": args.config,
        "n": n, "d": d, "k": k, "qbatch": qbatch, "dtype": dtype,
        "gen_seconds": round(gen_s, 1),
        "paths_ms": {p: round(v * 1000, 3) for p, v in paths.items()},
        "paths_gbps": {p: round(bytes_scanned / v / 1e9, 1) for p, v in paths.items()},
        "paths_qps": {p: round(qbatch / v, 1) for p, v in paths.items()},
    }))


if __name__ == "__main__":
    main()

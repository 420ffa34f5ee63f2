"""Beyond-HBM rehearsal: HostArenaIVF at a corpus size where the exhaustive
device scan is PHYSICALLY IMPOSSIBLE (VERDICT r4 "Next round" #1, second
branch: "an IVF design validated at a scale where scanning is impossible").

Default 50M x 384 int8 = 19.2 GB of vectors — a v5e chip has 16 GB HBM, so
no flat scan can exist; the reference handles this tier by holding an
hnswlib graph in host RAM (/root/reference/api/app.py:86-91).  This tier
(tpu_rag/index/host_ivf.py) keeps int8 inverted lists in host RAM and runs
centroid probe + gathered-union scan on the device.

The corpus is BORN ON DEVICE (chunked low-rank generator — same family as
bench scale_10m) and only the quantized int8 rows cross the link once, so
the build transfer is bounded by one corpus readback.  Ground truth is an
exact int8 scan computed ON HOST (numpy, chunked) for a small query set.

Artifact: docs/scale_host_ivf.json.
Run: python scripts/rehearse_host_ivf.py [--n 50000000] [--chunk 250000]
Self-limiting; no external timeout (TPU tunnel rule).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000_000)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--nlist", type=int, default=16384)
    ap.add_argument("--chunk", type=int, default=250_000)
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--train-sample", type=int, default=262_144)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-serve", action="store_true",
                    help="stop after build+GT (CPU smoke: interpret-mode "
                         "pallas emulation makes the serve sweep crawl)")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = args.out or os.path.join(repo, "docs", "scale_host_ivf.json")
    d, n, chunk = args.d, args.n, args.chunk
    rep: dict = {"n": n, "dim": d, "nlist": args.nlist,
                 "backend": jax.default_backend(),
                 "hbm_note": f"{n * d / 1e9:.1f} GB int8 vectors vs 16 GB "
                             "HBM: device-resident scan impossible"}

    from tpu_rag.index.host_ivf import HostArenaIVF

    kB, kQ = jax.random.split(jax.random.PRNGKey(11))
    Bq, _ = jnp.linalg.qr(jax.random.normal(kB, (d, d), jnp.float32))
    B = Bq * jax.lax.rsqrt(jnp.arange(1, d + 1, dtype=jnp.float32))[:, None]

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen(key, rows):
        z = jax.random.normal(key, (rows, d), jnp.float32)
        g = z @ B
        return g * jax.lax.rsqrt(jnp.sum(g * g, 1, keepdims=True) + 1e-9)

    ivf = HostArenaIVF(d, nlist=args.nlist, nprobe=64, cap_factor=2.0,
                       expected_rows=n,
                       max_overflow=max(2_000_000, n // 4))
    t0 = time.perf_counter()
    sample = gen(jax.random.PRNGKey(0), min(args.train_sample, n))
    ivf.train(sample)
    del sample
    rep["train_s"] = round(time.perf_counter() - t0, 1)
    print(f"trained {args.nlist} centroids in {rep['train_s']}s", flush=True)

    t0 = time.perf_counter()
    keys = jax.random.split(jax.random.PRNGKey(1), -(-n // chunk))
    off = 0
    first = None
    for ki, key in enumerate(keys):
        rows = min(chunk, n - off)
        c = gen(key, rows)
        if first is None:
            first = np.asarray(c[:64], np.float32)
        ivf.add(c)   # device array in: only int8+assign cross the link
        off += rows
        if (ki + 1) % 20 == 0:
            el = time.perf_counter() - t0
            print(f"  {off}/{n} rows in {el:.0f}s "
                  f"({off / el:.0f} rows/s, rss {rss_gb():.1f} GB)",
                  flush=True)
    build_s = time.perf_counter() - t0
    rep["build"] = {"rows": off, "seconds": round(build_s, 1),
                    "rows_per_s": round(off / build_s, 1),
                    "spilled_rows": int(ivf.spilled_rows),
                    "rss_gb": round(rss_gb(), 2)}
    print(f"build: {rep['build']}", flush=True)

    # queries: perturbed copies of known rows (same recipe as bench 10M)
    rngq = np.random.default_rng(3)
    eps = rngq.standard_normal((args.queries, d)).astype(np.float32) @ \
        np.asarray(B)
    eps /= np.maximum(np.linalg.norm(eps, axis=1, keepdims=True), 1e-9)
    q = first[:args.queries] + 0.25 * eps
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-9)

    # host ground truth: exact int8-quantized scan over the lists + overflow
    # (numpy, chunked over lists) — the only place 19 GB fits is host RAM
    t0 = time.perf_counter()
    best_sc = np.full((args.queries, args.k), -np.inf, np.float32)
    best_row = np.full((args.queries, args.k), -1, np.int64)

    def fold(scores, rows_np):
        nonlocal best_sc, best_row
        allsc = np.concatenate([best_sc, scores], axis=1)
        allrw = np.concatenate(
            [best_row, np.broadcast_to(rows_np, scores.shape)], axis=1)
        pick = np.argsort(-allsc, axis=1, kind="stable")[:, :args.k]
        best_sc = np.take_along_axis(allsc, pick, axis=1)
        best_row = np.take_along_axis(allrw, pick, axis=1)

    lists_per_blk = max(1, 2_000_000 // max(ivf.cap, 1))
    for l0 in range(0, args.nlist, lists_per_blk):
        l1 = min(l0 + lists_per_blk, args.nlist)
        blk = ivf._vec[l0:l1].reshape(-1, d).astype(np.float32)
        scl = ivf._scale[l0:l1].reshape(-1)
        rws = ivf._row[l0:l1].reshape(-1)
        live = rws >= 0
        if not live.any():
            continue
        sc = (q @ blk[live].T) * scl[live][None, :]
        fold(sc.astype(np.float32), rws[live][None, :])
    if ivf.spilled_rows:
        ov = np.concatenate(ivf._ov_vec, axis=0).astype(np.float32)
        os_ = np.concatenate(ivf._ov_scale, axis=0)
        orw = np.concatenate(ivf._ov_row, axis=0)
        sc = (q @ ov.T) * os_[None, :]
        fold(sc.astype(np.float32), orw[None, :])
    rep["gt_seconds_host"] = round(time.perf_counter() - t0, 1)
    gt = [set(r.tolist()) for r in best_row]
    print(f"host GT in {rep['gt_seconds_host']}s", flush=True)

    # serve sweep: latency + recall per nprobe, qb1 and qb8
    sweep = []
    for qb in ([] if args.skip_serve else [1, args.queries]):
        for nprobe in (32, 64, 128):
            qq = q[:qb]
            ivf.search(qq, args.k, nprobe=nprobe)  # warm/compile
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                sc, rows = ivf.search(qq, args.k, nprobe=nprobe)
            dt = (time.perf_counter() - t0) / iters
            rec = float(np.mean([
                len(set(rows[i][rows[i] >= 0].tolist()) & gt[i]) / args.k
                for i in range(qb)]))
            row = {"qbatch": qb, "nprobe": nprobe,
                   "ms_per_batch": round(dt * 1e3, 1),
                   "qps": round(qb / dt, 2),
                   "recall_at_10": round(rec, 4),
                   "union_bytes_mb": round(
                       nprobe * qb * ivf.cap * d / 1e6, 1)}
            sweep.append(row)
            print("serve", row, flush=True)
    rep["serve"] = sweep
    rep["rss_gb_final"] = round(rss_gb(), 2)
    with open(out_path, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()

"""BASELINE #3 end-to-end rehearsal: 1M passages x 768-d through the real
pipeline (VERDICT r4 "Next round" #6).

The reference's config #3 is 1M MS MARCO passages under bge-base-768
(BASELINE.md); this image has zero egress, so the rehearsal uses the same
SHAPES with synthetic weights and a hybrid corpus, exercised through the
REAL serving pipeline:

  1. bge-base-shaped BiEncoder (768-d, 12 layers; deterministic seeded
     weights) embeds 20K real corpus docs on the TPU — the production
     tokenize -> bucketize -> fused-forward path (models/biencoder.py).
  2. The remaining rows are synthesized ON DEVICE from the measured
     embedding distribution (PCA basis of the real embeddings, matched
     spectrum), normalized — 1M rows total at 768-d.  Embedding 1M real
     passages through a 110M-param encoder is ~22 PFLOP (days on one v5e);
     the synthetic tail keeps the geometry while making the rehearsal
     runnable.  This is recorded honestly in the artifact.
  3. All 1M rows ingest through FlatIndex.add() (dtype=auto -> the
     production quantize/upload/registry path), then save_index().
  4. Recall + QPS are measured through BOTH the index API and the HTTP
     server (/search with rerank off), vs f32 exact ground truth.

Artifact: docs/scale_1m768.json (+ stdout summary line).

Run:  python scripts/rehearse_scale.py [--n 1000000] [--real 20000]
Self-limiting; no external timeout (TPU tunnel rule).
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--real", type=int, default=20_000)
    ap.add_argument("--dim-model", default="bge-base")
    ap.add_argument("--corpus", default="/tmp/corpus40k.jsonl")
    ap.add_argument("--out", default=None,
                    help="artifact path (default docs/scale_1m768.json)")
    ap.add_argument("--queries", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = args.out or os.path.join(repo, "docs", "scale_1m768.json")
    rep: dict = {"n": args.n, "model_shape": args.dim_model,
                 "real_rows": args.real, "backend": jax.default_backend()}

    from tpu_rag.models.biencoder import BiEncoder

    vocab = os.path.join(repo, "examples", "vocab.txt")
    enc = BiEncoder(args.dim_model, seq_len=128, batch=128,
                    tokenizer_path=vocab if os.path.isfile(vocab) else "")
    rep["dim"] = enc.dim
    rep["encoder"] = {"hidden": enc.spec.hidden, "layers": enc.spec.layers,
                      "seq_len": enc.seq_len}

    # ---- 1. embed real docs through the production path
    texts = []
    with open(args.corpus, encoding="utf-8") as f:
        for line in f:
            d = json.loads(line)
            for key in ("body", "summary"):
                t = (d.get(key) or "").strip()
                if t:
                    texts.append(t[:1200])
            if len(texts) >= args.real + args.queries:
                break
    q_texts = texts[args.real:args.real + args.queries]
    texts = texts[:args.real]
    print(f"embedding {len(texts)} real docs at {enc.dim}-d ...", flush=True)
    enc.embed(texts[:256])  # warm compile
    t0 = time.perf_counter()
    emb = np.asarray(enc.embed(texts), np.float32)
    embed_s = time.perf_counter() - t0
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
    rep["embed_real"] = {"docs": len(texts),
                         "seconds": round(embed_s, 1),
                         "docs_per_s": round(len(texts) / embed_s, 1)}
    print(f"  {rep['embed_real']}", flush=True)

    # ---- 2. synthesize the tail from the measured distribution (on device)
    mean = emb.mean(axis=0)
    xc = jnp.asarray(emb - mean)
    # top-256 spectrum of the real embeddings
    _, s_vals, vt = jnp.linalg.svd(xc, full_matrices=False)
    r_keep = min(256, len(texts) - 1, int(enc.dim))
    s_keep = s_vals[:r_keep] / jnp.sqrt(jnp.float32(len(texts)))
    vt_keep = vt[:r_keep]
    mean_d = jnp.asarray(mean)

    import functools

    @functools.partial(jax.jit, static_argnames=("rows",))
    def synth_chunk(key, rows):
        g = jax.random.normal(key, (rows, r_keep), jnp.float32)
        x = mean_d + (g * s_keep) @ vt_keep
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=1, keepdims=True), 1e-9)

    # ---- 3. ingest through FlatIndex.add (production path)
    from tpu_rag.index import FlatIndex, save_index

    idx = FlatIndex(enc.dim, dtype="auto", use_pallas=True)
    t0 = time.perf_counter()
    step = 100_000
    idx.add([f"real-{i}" for i in range(len(emb))], emb,
            ["real"] * len(emb), [{} for _ in range(len(emb))])
    n_syn = args.n - len(emb)
    keys = jax.random.split(jax.random.PRNGKey(42), -(-n_syn // step))
    off = len(emb)
    for ki, key in enumerate(keys):
        rows = min(step, args.n - off)
        chunk = np.asarray(synth_chunk(key, rows), np.float32)
        idx.add([f"syn-{off + i}" for i in range(rows)], chunk,
                ["syn"] * rows, [{} for _ in range(rows)])
        off += rows
        if (ki + 1) % 3 == 0:
            print(f"  ingested {off}/{args.n} rows "
                  f"(rss {rss_gb():.1f} GB)", flush=True)
    ingest_s = time.perf_counter() - t0
    rep["ingest"] = {"rows": off, "seconds": round(ingest_s, 1),
                     "rows_per_s": round(off / ingest_s, 1),
                     "dtype_resolved": idx.dtype,
                     "mode_resolved": idx.effective_search_mode(off),
                     "rss_gb": round(rss_gb(), 2)}
    print(f"  {rep['ingest']}", flush=True)

    # ---- 4a. ground truth for the real query texts (f32 exact, host)
    qv = np.asarray(enc.embed(q_texts), np.float32)
    qv /= np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-9)
    master = idx._arena.view  # f32 master rows (host arena)
    t0 = time.perf_counter()
    gt = []
    for qi in range(len(qv)):
        sims = master @ qv[qi]
        gt.append(set(np.argsort(-sims)[:args.k].tolist()))
    rep["gt_seconds_host"] = round(time.perf_counter() - t0, 1)

    # ---- 4b. index-API recall + QPS
    res = idx.search(qv, args.k)
    rec_idx = float(np.mean([
        len(set(res.rows[i]) & gt[i]) / args.k for i in range(len(qv))]))
    qb = 64
    qbig = np.concatenate([qv] * (-(-qb // len(qv))), axis=0)[:qb]
    idx.search(qbig, args.k)
    t0 = time.perf_counter()
    for _ in range(10):
        idx.search(qbig, args.k)
    qps_idx = qb * 10 / (time.perf_counter() - t0)
    rep["index_api"] = {"recall_at_10_vs_f32": round(rec_idx, 4),
                        "qps_qb64": round(qps_idx, 1)}
    print(f"  {rep['index_api']}", flush=True)

    # ---- 5. serve over HTTP: real engine, /search, recall + load
    import socket
    import threading
    import urllib.request

    from tpu_rag.api.app import create_app
    from tpu_rag.api.server import HTTPServer
    from tpu_rag.config import Config
    from tpu_rag.engine import RagEngine

    tmp = "/tmp/rehearse_1m768"
    cfg = Config(persist_dir=os.path.join(tmp, "vs"),
                 kb_db_path=os.path.join(tmp, "db/kb.sqlite3"),
                 db_path=os.path.join(tmp, "db/app.sqlite3"),
                 docs_dir=os.path.join(tmp, "docs"),
                 summarize_mode="off", model_priority=("extractive",))
    eng = RagEngine(cfg, encoder=enc, index=idx)
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    srv = HTTPServer(create_app(cfg, engine=eng), "127.0.0.1", port,
                     executor_workers=300)
    threading.Thread(target=srv.run, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(200):
        try:
            urllib.request.urlopen(base + "/health", timeout=0.5)
            break
        except Exception:
            time.sleep(0.1)
    recs = []
    lat = []
    for qi, text in enumerate(q_texts):
        req = urllib.request.Request(
            base + "/search",
            data=json.dumps({"query": text, "k": args.k,
                             "rerank": False}).encode(),
            headers={"content-type": "application/json"})
        t0 = time.perf_counter()
        body = json.loads(urllib.request.urlopen(req, timeout=300).read())
        lat.append((time.perf_counter() - t0) * 1e3)
        got = {h.get("id", "") for h in body.get("hits", [])[:args.k]}
        # row order == insertion order: rows < len(emb) are "real-<r>",
        # the rest "syn-<r>"
        gt_ids = {(f"real-{r}" if r < len(emb) else f"syn-{r}")
                  for r in gt[qi]}
        recs.append(len(got & gt_ids) / args.k)
    rep["http"] = {"recall_at_10_vs_f32": round(float(np.mean(recs)), 4),
                   "p50_ms": round(float(np.median(lat)), 1),
                   "queries": len(q_texts)}
    print(f"  {rep['http']}", flush=True)

    # short concurrent load through the real load client
    try:
        import subprocess as sp
        out = sp.run([sys.executable,
                      os.path.join(repo, "scripts", "bench_http.py"),
                      "--base", base, "--mode", "single",
                      "--concurrency", "64", "--duration", "8",
                      "--warmup", "2", "--k", str(args.k)],
                     capture_output=True, text=True, timeout=300)
        load = json.loads(out.stdout.strip().splitlines()[-1])
        rep["http_load"] = {kk: load.get(kk) for kk in
                            ("qps", "p50_ms", "p95_ms", "requests_failed")}
    except Exception as e:
        rep["http_load"] = {"error": str(e)[:160]}

    rep["rss_gb_final"] = round(rss_gb(), 2)
    with open(out_path, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()

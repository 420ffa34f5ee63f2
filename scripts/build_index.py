#!/usr/bin/env python
"""Offline index builder.

Parity with reference scripts/build_index.py:98-120: recursively scan
DOCS_DIR/**/*.json (single doc or list per file), chunk (summary + body
sections — tpu_rag/ingest/chunker.py), embed on TPU in fixed-shape batches,
upsert into the persistent index.  Unlike the reference (which embeds one
Chroma upsert at a time inside hnswlib), chunks across ALL files are batched
through the encoder for MXU-friendly throughput.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="Build the vector index from DOCS_DIR JSON docs")
    ap.add_argument("--docs-dir", default=None, help="override DOCS_DIR")
    ap.add_argument("--batch", type=int, default=256, help="embed batch size")
    args = ap.parse_args()

    # honor JAX_PLATFORMS even when a site hook (e.g. the axon TPU plugin)
    # overrides platform selection after env parsing — JAX_PLATFORMS=cpu
    # must build on CPU without touching a tunneled TPU
    if os.getenv("JAX_PLATFORMS"):
        import jax
        try:
            jax.config.update("jax_platforms", os.getenv("JAX_PLATFORMS"))
        except Exception:
            pass

    from tpu_rag.config import config_from_env
    from tpu_rag.engine import RagEngine
    from tpu_rag.ingest.chunker import to_chunks

    cfg = config_from_env()
    if args.docs_dir:
        cfg.docs_dir = args.docs_dir
    engine = RagEngine(cfg)

    files = glob.glob(os.path.join(cfg.docs_dir, "**", "*.json"), recursive=True)
    if not files:
        print("No JSON files under docs/. Add files (supports subfolders) and rerun.")
        return

    all_chunks: list[dict] = []
    total_docs = 0
    for fp in files:
        try:
            with open(fp, "r", encoding="utf-8") as f:
                data = json.load(f)
        except Exception as e:
            print(f"[SKIP] {fp} -> JSON parse error: {e}")
            continue
        docs = data if isinstance(data, list) else [data]
        for d in docs:
            all_chunks.extend(to_chunks(d, fp, cfg.docs_dir))
            total_docs += 1
        print(f"Scanned: {os.path.relpath(fp, cfg.docs_dir)}")

    t0 = time.time()
    for i in range(0, len(all_chunks), args.batch):
        batch = all_chunks[i : i + args.batch]
        vecs = engine.embed([c["text"] for c in batch])
        engine.index.add(
            [c["id"] for c in batch], vecs,
            [c["text"] for c in batch], [c["metadata"] for c in batch],
        )
        print(f"Embedded {min(i + args.batch, len(all_chunks))}/{len(all_chunks)} chunks")
    engine.persist_index()
    dt = time.time() - t0
    rate = len(all_chunks) / dt if dt > 0 else float("inf")
    print(f"Done. Indexed logical documents: {total_docs} ({len(all_chunks)} chunks, "
          f"{dt:.1f}s, {rate:.0f} chunks/s). Persist at: {cfg.persist_dir}")


if __name__ == "__main__":
    main()

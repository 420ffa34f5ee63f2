#!/usr/bin/env python
"""Bulk import with [UPSERT] reporting.

Parity with reference scripts/bulk_import.py (a near-duplicate of
build_index with per-doc upsert reporting); here it shares the same chunker
and engine instead of duplicating them.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="Bulk-import JSON docs into the index")
    ap.add_argument("paths", nargs="*", help="files or dirs (default: DOCS_DIR)")
    args = ap.parse_args()

    from tpu_rag.config import config_from_env
    from tpu_rag.engine import RagEngine
    from tpu_rag.ingest.chunker import to_chunks

    cfg = config_from_env()
    engine = RagEngine(cfg)

    files: list[str] = []
    for p in args.paths or [cfg.docs_dir]:
        if os.path.isdir(p):
            files.extend(glob.glob(os.path.join(p, "**", "*.json"), recursive=True))
        else:
            files.append(p)

    total = 0
    for fp in files:
        try:
            with open(fp, "r", encoding="utf-8") as f:
                data = json.load(f)
        except Exception as e:
            print(f"[SKIP] {fp}: {e}")
            continue
        docs = data if isinstance(data, list) else [data]
        for d in docs:
            chunks = to_chunks(d, fp, cfg.docs_dir)
            vecs = engine.embed([c["text"] for c in chunks])
            engine.index.add([c["id"] for c in chunks], vecs,
                             [c["text"] for c in chunks],
                             [c["metadata"] for c in chunks])
            print(f"[UPSERT] {d.get('id') or os.path.basename(fp)} ({len(chunks)} chunks)")
            total += 1
    engine.persist_index()
    print(f"Done. Upserted {total} documents.")


if __name__ == "__main__":
    main()

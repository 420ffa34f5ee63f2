#!/usr/bin/env python
"""Simple alternate ingester: whole-doc (no chunking).

Parity with reference scripts/ingest_docs_to_chroma.py: one vector per doc
from its `content|text|body` field; the doc id (or filename) is the vector
id.  Prefer scripts/build_index.py for section-level retrieval.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="Whole-doc ingest (no chunking)")
    ap.add_argument("--docs-dir", default=None)
    args = ap.parse_args()

    from tpu_rag.config import config_from_env
    from tpu_rag.engine import RagEngine
    from tpu_rag.ingest.schema import normalize_value

    cfg = config_from_env()
    if args.docs_dir:
        cfg.docs_dir = args.docs_dir
    engine = RagEngine(cfg)

    files = glob.glob(os.path.join(cfg.docs_dir, "**", "*.json"), recursive=True)
    count = 0
    for fp in files:
        try:
            doc = json.load(open(fp, encoding="utf-8"))
        except Exception as e:
            print(f"[SKIP] {fp}: {e}")
            continue
        docs = doc if isinstance(doc, list) else [doc]
        for d in docs:
            text = d.get("content") or d.get("text") or normalize_value(d.get("body", ""))
            if not str(text).strip():
                continue
            doc_id = d.get("id") or os.path.splitext(os.path.basename(fp))[0]
            meta = {"namespace": d.get("namespace", ""),
                    "canonicality": d.get("canonicality", "canon"),
                    "title": d.get("title", doc_id)}
            vec = engine.embed([str(text)])
            engine.index.add([doc_id], vec, [str(text)], [meta])
            count += 1
            print(f"[ADD] {doc_id}")
    engine.persist_index()
    print(f"Done: {count} docs.")


if __name__ == "__main__":
    main()

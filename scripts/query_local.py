#!/usr/bin/env python
"""Direct local index query CLI.

Parity with reference scripts/query_local.py:12-66: --k --namespace
--canonicality --json flags, pretty or JSON output, k clamped 1..20.
Queries the persisted index directly (no HTTP server needed).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="Query the local vector index")
    ap.add_argument("query", help="query text")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--namespace", default=None)
    ap.add_argument("--canonicality", default=None)
    ap.add_argument("--json", action="store_true", help="JSON output")
    args = ap.parse_args()

    from tpu_rag.config import config_from_env
    from tpu_rag.engine import RagEngine

    engine = RagEngine(config_from_env())
    hits = engine.query_vector(args.query, max(1, min(args.k, 20)),
                               args.namespace, args.canonicality)
    if args.json:
        print(json.dumps({"hits": hits}, ensure_ascii=False, indent=2))
        return
    if not hits:
        print("(no hits)")
        return
    for h in hits:
        m = h.get("metadata") or {}
        print(f"#{h['rank']}  score={h['score']:.4f}  id={h['id']}")
        print(f"    ns={m.get('namespace')}  canon={m.get('canonicality')}  "
              f"section={m.get('section')}  title={m.get('title')}")
        text = (h.get("text") or "").replace("\n", " ")
        print(f"    {text[:200]}{'…' if len(text) > 200 else ''}")


if __name__ == "__main__":
    main()

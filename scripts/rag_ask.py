#!/usr/bin/env python
"""HTTP RAG client: /search -> grounded answer.

Parity with reference scripts/rag_ask.py:30-106: POST /search against a
running server, build a [file#section]-tagged context, answer with a curator
system prompt through an LLM backend, print answer + source tags.  The LLM
side uses the framework's dispatcher (openai/ollama/extractive) instead of
requiring the OpenAI SDK.
"""

from __future__ import annotations

import argparse
import os
import sys

import requests

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CURATOR_SYS = (
    "You are a careful data curator. Answer strictly from the provided "
    "sources; cite them with their [tag]. If the sources don't contain the "
    "answer, say what is missing."
)


def main() -> None:
    ap = argparse.ArgumentParser(description="Ask a question against a running RAG server")
    ap.add_argument("query")
    ap.add_argument("--api", default=os.getenv("RAG_API", "http://localhost:8000"))
    ap.add_argument("--api-key", default=os.getenv("API_KEY", ""))
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--engine", default=None, help="openai | ollama | extractive")
    ap.add_argument("--namespace", default=None)
    args = ap.parse_args()

    headers = {"content-type": "application/json"}
    if args.api_key:
        headers["x-api-key"] = args.api_key
    r = requests.post(f"{args.api}/search", headers=headers,
                      json={"query": args.query, "k": args.k,
                            "namespace": args.namespace}, timeout=120)
    r.raise_for_status()
    hits = r.json().get("hits", [])
    if not hits:
        print("(no hits)")
        return

    blocks, tags = [], []
    for h in hits:
        m = h.get("metadata") or {}
        tag = f"{m.get('file_path') or h.get('id')}#{m.get('section') or ''}"
        tags.append(tag)
        blocks.append(f"[{tag}]\n{h.get('text', '')}")
    context = "\n\n".join(blocks)

    from tpu_rag.config import config_from_env
    from tpu_rag.llm import LLMDispatcher

    dispatcher = LLMDispatcher(config_from_env())
    messages = [
        {"role": "system", "content": CURATOR_SYS},
        {"role": "user", "content": f"Sources:\n{context}\n\nQuestion: {args.query}"},
    ]
    answer, engine = dispatcher.generate(messages, engine=args.engine, temperature=0.2)
    print(answer)
    print("\n--- sources ---")
    for t in tags:
        print(f"  [{t}]")
    print(f"(engine: {engine})")


if __name__ == "__main__":
    main()

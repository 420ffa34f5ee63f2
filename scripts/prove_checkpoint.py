#!/usr/bin/env python
"""Turnkey pretrained-checkpoint proof (VERDICT r3 #7).

The reference's retrieval quality comes from real pretrained weights
(all-MiniLM-L6-v2 bi-encoder + ms-marco cross-encoder — reference
api/config.py:15,33, api/app.py:90-104).  This image ships no weights (zero
egress), so quality parity is env-gated — but the IMPORT PATH must be
provable in one command the moment a checkpoint directory exists:

  python scripts/prove_checkpoint.py --embedding-weights /path/to/minilm \
      [--rerank-weights /path/to/ms-marco] [--k 10]

Runs, and gates on, two checks:

1. torch-parity: the Flax encoder loaded from the checkpoint must produce
   the same mean-pooled, L2-normalized embeddings as the torch
   `BertModel.from_pretrained` forward on identical token ids (isolates
   model-mapping parity from tokenizer differences).  Skipped (not failed)
   when torch/transformers cannot load the directory.
2. bundled-corpus recall: embed the checked-in examples/docs corpus with the
   checkpoint, build the serving-default FlatIndex (bf16 + f32 refine), and
   measure recall@k against exact f32 search on the same embeddings, plus a
   self-retrieval rate (title query -> own doc in top-k) as a quality
   smoke.  If --rerank-weights is given, the cross-encoder must load and
   score a (query, positive, negative) triple in the right order.

Prints ONE JSON line; exit 0 iff every executed gate passed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bundled_texts(max_docs: int) -> tuple[list[str], list[str]]:
    """(texts, title_queries) from the checked-in examples corpus."""
    import glob

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "docs")
    texts, titles = [], []
    for path in sorted(glob.glob(os.path.join(root, "**", "*.json"),
                                 recursive=True))[:max_docs]:
        try:
            with open(path, encoding="utf-8") as f:
                doc = json.load(f)
        except Exception:
            continue
        title = str(doc.get("title", ""))
        body = doc.get("body", "")
        if isinstance(body, dict):
            body = " ".join(str(v) for v in body.values())
        text = " ".join(x for x in (title, str(doc.get("summary", "")),
                                    str(body)) if x)[:2000]
        if text.strip():
            texts.append(text)
            titles.append(title or text[:60])
    return texts, titles


def torch_parity(weights: str, spec, tokenizer, seq_len: int) -> dict:
    """Max |ours - torch| over mean-pooled normalized embeddings on shared
    token ids.  {"skipped": reason} when torch can't load the directory."""
    try:
        import torch
        import transformers
    except Exception as e:  # pragma: no cover - both are baked into CI
        return {"skipped": f"torch/transformers unavailable: {e}"}
    try:
        tm = transformers.BertModel.from_pretrained(weights).eval()
    except Exception as e:
        return {"skipped": f"torch could not load the dir: {e}"}

    import jax.numpy as jnp
    import numpy as np

    from tpu_rag.models.bert import BertEncoder
    from tpu_rag.models.biencoder import l2_normalize, mean_pool
    from tpu_rag.models.hf_import import load_bert_params

    params = load_bert_params(weights, spec)
    if params is None:
        return {"ok": False, "error": "load_bert_params returned None"}
    sents = [
        "The moon temple stands on the silver cliff.",
        "Trade caravans cross the iron pass each autumn season.",
        "A short one.",
    ]
    t = min(seq_len, 64)
    ids = np.zeros((len(sents), t), np.int64)
    mask = np.zeros((len(sents), t), np.int64)
    for r, s in enumerate(sents):
        row = tokenizer.tokenize_ids(s)[: t - 2]
        row = [101] + row + [102] if spec.vocab_size > 103 else [1] + row + [2]
        row = [min(i, spec.vocab_size - 1) for i in row]
        ids[r, : len(row)] = row
        mask[r, : len(row)] = 1
    with torch.no_grad():
        hidden = tm(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    ref = (hidden * m).sum(1) / np.maximum(m.sum(1), 1e-9)
    ref /= np.maximum(np.linalg.norm(ref, axis=1, keepdims=True), 1e-9)

    module = BertEncoder(spec, dtype=jnp.float32)
    ours_h = module.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                          jnp.asarray(mask, jnp.int32))
    ours = np.asarray(l2_normalize(mean_pool(
        ours_h, jnp.asarray(mask, jnp.int32)).astype(jnp.float32)))
    diff = float(np.max(np.abs(ours - ref)))
    return {"ok": diff < 2e-3, "max_abs_diff": round(diff, 6)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embedding-weights", required=True)
    ap.add_argument("--rerank-weights", default="")
    ap.add_argument("--tokenizer", default="",
                    help="vocab.txt path; defaults to one inside the weights dir")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--max-docs", type=int, default=254)
    ap.add_argument("--seq-len", type=int, default=256)
    args = ap.parse_args()

    import numpy as np

    from tpu_rag.models.biencoder import BiEncoder, spec_for_model
    from tpu_rag.models.hf_import import spec_from_hf_config

    spec = (spec_from_hf_config(args.embedding_weights)
            or spec_for_model(args.embedding_weights))
    tok_path = args.tokenizer
    if not tok_path:
        cand = os.path.join(args.embedding_weights, "vocab.txt")
        tok_path = cand if os.path.isfile(cand) else ""
    enc = BiEncoder(args.embedding_weights, weights_path=args.embedding_weights,
                    tokenizer_path=tok_path, seq_len=args.seq_len, batch=64,
                    dtype="float32", spec=spec)

    report: dict = {"embedding_weights": args.embedding_weights,
                    "spec": {"hidden": spec.hidden, "layers": spec.layers,
                             "vocab": spec.vocab_size}}
    report["torch_parity"] = torch_parity(args.embedding_weights, spec,
                                          enc.tokenizer, args.seq_len)

    texts, titles = _bundled_texts(args.max_docs)
    emb = np.asarray(enc.embed(texts), np.float32)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
    qv = np.asarray(enc.embed(titles), np.float32)
    qv /= np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-9)
    k = min(args.k, len(texts))
    gt = np.argsort(-(qv @ emb.T), axis=1)[:, :k]

    from tpu_rag.index import FlatIndex

    idx = FlatIndex(spec.hidden, dtype="bfloat16")
    idx.add([str(i) for i in range(len(texts))], emb, texts,
            [{} for _ in texts])
    res = idx.search(qv, k)
    recall = float(np.mean([
        len(set(res.rows[qi]) & set(gt[qi].tolist())) / k
        for qi in range(len(titles))]))
    self_hit = float(np.mean([
        qi in set(res.rows[qi]) for qi in range(len(titles))]))
    report["bundled_recall_at_k"] = {
        "k": k, "docs": len(texts), "recall_vs_f32": round(recall, 4),
        "self_retrieval_rate": round(self_hit, 4),
        "ok": recall >= 0.98}

    if args.rerank_weights:
        from tpu_rag.models.crossencoder import CrossEncoder

        ce_spec = (spec_from_hf_config(args.rerank_weights)
                   or spec_for_model(args.rerank_weights))
        try:
            ce = CrossEncoder(args.rerank_weights,
                              weights_path=args.rerank_weights,
                              tokenizer_path=tok_path, spec=ce_spec)
            qi = 0
            pos, neg = texts[qi], texts[(qi + len(texts) // 2) % len(texts)]
            sc = ce.predict([(titles[qi], pos), (titles[qi], neg)])
            report["rerank"] = {"ok": bool(sc[0] > sc[1]),
                                "pos_score": round(float(sc[0]), 4),
                                "neg_score": round(float(sc[1]), 4)}
        except Exception as e:
            report["rerank"] = {"ok": False, "error": str(e)[:200]}

    gates = [v for v in report.values()
             if isinstance(v, dict) and "ok" in v]
    report["passed"] = all(v["ok"] for v in gates)
    print(json.dumps(report))
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())

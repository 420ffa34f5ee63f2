"""Cross-encoder reranking with degrade-don't-fail semantics.

Parity with reference api/app.py:568-583: score [query, text] pairs, attach
rerank_score, sort descending, rewrite ranks; any model failure returns the
hits unchanged.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def rerank_hits(cross_encoder, query: str, hits: list[dict]) -> list[dict]:
    if not hits or cross_encoder is None:
        return hits
    try:
        pairs = [(query, h.get("text", "")) for h in hits]
        scores = cross_encoder.predict(pairs).tolist()
    except Exception as e:  # degrade, don't fail (reference behavior)
        logger.warning("cross-encoder predict failed: %s", e)
        return hits
    for h, s in zip(hits, scores):
        h["rerank_score"] = float(s)
    hits.sort(key=lambda x: x.get("rerank_score", 0.0), reverse=True)
    for i, h in enumerate(hits, 1):
        h["rank"] = i
    return hits

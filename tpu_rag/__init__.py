"""tpu_rag — a TPU-native retrieval-augmented-generation framework.

A from-scratch rebuild of the capabilities of akak0487521/Local-RAG-System
(reference layout surveyed in SURVEY.md), designed TPU-first:

- The ANN engine (reference: chromadb -> hnswlib C++, see
  reference api/app.py:86-91) is replaced by a JAX/Pallas index engine:
  flat and IVF indexes resident in HBM, fused dot-product + top-k kernels,
  on-device k-means build, and sharded search with all-gather top-k merge
  over an ICI mesh (tpu_rag.ops, tpu_rag.index, tpu_rag.parallel).
- The embedding / rerank models (reference: sentence-transformers on
  torch-CPU, api/app.py:90,95-104) are Flax encoders jitted on TPU
  (tpu_rag.models).
- The HTTP layer (reference: FastAPI, api/app.py:106-121) is a first-party
  ASGI micro-framework + asyncio HTTP/1.1 server (tpu_rag.api).
- Storage (SQLite + FTS5 BM25, conversation memory) keeps the reference's
  schemas (reference api/db.py, api/app.py:195-315) as host-side storage —
  it is IO, not compute (tpu_rag.retrieval.fts, tpu_rag.memory).
"""

__version__ = "0.1.0"

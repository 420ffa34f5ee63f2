"""Exact flat index resident in HBM.

Replaces the reference's Chroma collection (hnswlib HNSW ANN — reference
api/app.py:86-91) with a dense matrix in device memory searched by the fused
matmul+top-k kernel (tpu_rag/ops/topk.py).  Exact (recall 1.0) by
construction; the approximate/scale-out variants are IVFIndex and the
sharded search in tpu_rag/parallel.

Mutations (add/delete/upsert) are host-side numpy appends + tombstones,
mirroring how the reference's online indexer adds/deletes documents
(reference api/app.py:209-225,253-271).  The device snapshot is refreshed
lazily on the next search, so streaming ingestion never blocks serving on a
full rebuild.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Any

import numpy as np

import jax.numpy as jnp

from tpu_rag.index.filter import TagVocab
from tpu_rag.ops.quant import quantize_int8_rows
from tpu_rag.ops.topk import fused_matmul_topk, topk_xla_reference


@dataclass
class SearchResult:
    """One query's worth of hits lives at index i of each field."""

    ids: list[list[str]]
    similarities: list[list[float]]
    distances: list[list[float]]          # 1 - cosine, parity with Chroma-style distance
    rows: list[list[int]]
    metadatas: list[list[dict]] = field(default_factory=list)
    documents: list[list[str]] = field(default_factory=list)


def _normalize(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return (x / np.maximum(norms, 1e-12)).astype(np.float32)


class FlatIndex:
    """Exact cosine/IP index. Host master copy in numpy, device snapshot lazily."""

    kind = "flat"

    def __init__(
        self,
        dim: int,
        *,
        dtype: str = "bfloat16",
        metric: str = "cosine",
        use_pallas: bool = True,
        block_n: int = 8192,
        search_mode: str = "exact",   # "exact" | "bucketed" (approx, faster)
    ) -> None:
        if metric not in ("cosine", "ip"):
            raise ValueError(f"unsupported metric: {metric}")
        self.dim = dim
        self.dtype = dtype
        self.metric = metric
        self.use_pallas = use_pallas
        self.block_n = block_n
        self.search_mode = search_mode
        # measured on v5e: the XLA-fused path wins below ~2M rows (per-call
        # dispatch overhead dominates), the Pallas kernel wins above
        # (630 vs 525 GB/s at 10M). use_pallas=True picks automatically;
        # set pallas_min_rows=0 to force the Pallas kernel always.
        self.pallas_min_rows = 2_000_000
        # int8 two-stage refine: scan int8 for refine_factor*k candidates,
        # then exactly re-score those few rows with the f32 master copy
        # (recall 0.934 -> ~bf16-level at int8 scan cost). 0 disables.
        self.refine_factor = 4

        self._vectors = np.zeros((0, dim), np.float32)
        self._ids: list[str] = []
        self._id_to_row: dict[str, int] = {}
        self._metadatas: list[dict] = []
        self._documents: list[str] = []
        self._ns: np.ndarray = np.zeros((0,), np.int32)
        self._canon: np.ndarray = np.zeros((0,), np.int32)
        self._alive: np.ndarray = np.zeros((0,), bool)
        self.ns_vocab = TagVocab()
        self.canon_vocab = TagVocab()

        self._device: dict[str, Any] | None = None  # lazily built snapshot
        self._dirty = True
        self._wants_cache: dict[tuple[int, int], Any] = {}  # device arrays
        self._xla_fn_cache: dict[int, Any] = {}  # jitted XLA search per k
        # guards host-side state across concurrent requests (the reference
        # had unguarded shared mutable state — SURVEY.md §5 race detection)
        self._lock = threading.RLock()

    # ------------------------------------------------------------- mutation

    def add(
        self,
        ids: list[str],
        vectors: np.ndarray,
        documents: list[str] | None = None,
        metadatas: list[dict] | None = None,
    ) -> None:
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) vectors, got {vectors.shape}")
        if len(ids) != vectors.shape[0]:
            raise ValueError("ids/vectors length mismatch")
        documents = documents or [""] * len(ids)
        metadatas = metadatas or [{} for _ in ids]
        if self.metric == "cosine":
            vectors = _normalize(vectors)

        with self._lock:
            # Upsert semantics: tombstone any existing row with the same id
            # (parity with Chroma upsert used by scripts/build_index.py:89-96).
            for i in ids:
                row = self._id_to_row.get(i)
                if row is not None:
                    self._alive[row] = False
                    del self._id_to_row[i]

            start = len(self._ids)
            self._vectors = np.concatenate([self._vectors, vectors], axis=0)
            ns = np.array([self.ns_vocab.intern(str(m.get("namespace", ""))) for m in metadatas], np.int32)
            canon = np.array([self.canon_vocab.intern(str(m.get("canonicality", ""))) for m in metadatas], np.int32)
            self._ns = np.concatenate([self._ns, ns])
            self._canon = np.concatenate([self._canon, canon])
            self._alive = np.concatenate([self._alive, np.ones(len(ids), bool)])
            for off, (i, doc, meta) in enumerate(zip(ids, documents, metadatas)):
                self._ids.append(i)
                self._documents.append(doc or "")
                self._metadatas.append(dict(meta or {}))
                self._id_to_row[i] = start + off
            self._dirty = True

    upsert = add

    def delete(self, ids: list[str] | None = None, where: dict | None = None) -> int:
        """Delete by explicit ids and/or metadata equality (parity with
        Chroma collection.delete(ids=...) / delete(where={'source_key': ...}),
        reference api/app.py:264-271,290-315)."""
        n = 0
        with self._lock:
            for i in ids or []:
                row = self._id_to_row.pop(i, None)
                if row is not None:
                    self._alive[row] = False
                    n += 1
            if where:
                for row, meta in enumerate(self._metadatas):
                    if not self._alive[row]:
                        continue
                    if all(str(meta.get(k)) == str(v) for k, v in where.items()):
                        self._alive[row] = False
                        self._id_to_row.pop(self._ids[row], None)
                        n += 1
            if n:
                self._dirty = True
        return n

    def count(self) -> int:
        return int(self._alive.sum())

    def get(self, id_: str) -> dict | None:
        row = self._id_to_row.get(id_)
        if row is None:
            return None
        return {
            "id": id_,
            "document": self._documents[row],
            "metadata": self._metadatas[row],
            "vector": self._vectors[row],
        }

    # ------------------------------------------------------------- device

    def _compact(self) -> dict[str, Any]:
        """Build the device snapshot from live rows only, pre-padded to the
        kernel tile height (host-side, once per refresh) so searches skip all
        per-call padding work."""
        from tpu_rag.ops.topk import PAD_TAG, default_block_n

        live = np.flatnonzero(self._alive)
        n = len(live)
        dtype_bytes = 1 if self.dtype == "int8" else (2 if self.dtype == "bfloat16" else 4)
        bn = default_block_n(self.dim, dtype_bytes, self.block_n)
        n_pad = max(bn, -(-n // bn) * bn)

        vecs = np.zeros((n_pad, self.dim), np.float32)
        vecs[:n] = self._vectors[live]
        ns = np.full((n_pad,), PAD_TAG, np.int32)
        canon = np.full((n_pad,), PAD_TAG, np.int32)
        ns[:n] = self._ns[live]
        canon[:n] = self._canon[live]

        snap: dict[str, Any] = {
            "rows": live,                      # device row -> host row
            "ns": jnp.asarray(ns),
            "canon": jnp.asarray(canon),
            "n": n,
            "n_pad": n_pad,
            "bn": bn,
        }
        if self.dtype == "int8":
            vals, scales = quantize_int8_rows(jnp.asarray(vecs))
            scales = scales.at[n:].set(0.0) if n_pad > n else scales
            snap["vectors"] = vals
            snap["scales"] = scales
        else:
            jdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            snap["vectors"] = jnp.asarray(vecs, dtype=jdt)
            snap["scales"] = None
        return snap

    def device_snapshot(self) -> dict[str, Any]:
        with self._lock:
            if self._dirty or self._device is None:
                self._device = self._compact()
                self._dirty = False
            return self._device

    # ------------------------------------------------------------- search

    def search(
        self,
        queries: np.ndarray,
        k: int,
        *,
        namespace: str | None = None,
        canonicality: str | None = None,
    ) -> SearchResult:
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if self.metric == "cosine":
            queries = _normalize(queries)
        nq = queries.shape[0]

        want_ns = self.ns_vocab.lookup(namespace)
        want_canon = self.canon_vocab.lookup(canonicality)
        if want_ns == -2 or want_canon == -2 or self.count() == 0:
            # Filter tag never seen, or empty index -> no hits.
            empty: list = [[] for _ in range(nq)]
            return SearchResult(ids=[list() for _ in range(nq)], similarities=empty,
                                distances=[list() for _ in range(nq)],
                                rows=[list() for _ in range(nq)],
                                metadatas=[list() for _ in range(nq)],
                                documents=[list() for _ in range(nq)])

        snap = self.device_snapshot()
        qj = jnp.asarray(queries)
        # int8 two-stage refine: oversample candidates on the int8 scan,
        # re-score that handful exactly below.  (Not applied to bucketed
        # bf16: its bucket-max scores are already exact, so re-scoring only
        # churns near-ties — measured as recall noise on clustered data
        # where the rank-10/11 score gap is ~3e-4.)
        k_scan = k
        if self.dtype == "int8" and self.refine_factor > 0:
            k_scan = min(max(k * self.refine_factor, k), max(snap["n"], 1))
        # cache the filter pair as a device array: a fresh host->device
        # transfer per search costs a full RTT on tunneled backends
        wants = self._wants_cache.get((want_ns, want_canon))
        if wants is None:
            wants = jnp.array([[want_ns, want_canon]], jnp.int32)
            self._wants_cache[(want_ns, want_canon)] = wants
        if self.use_pallas and snap["n_pad"] >= self.pallas_min_rows:
            sc, idx = fused_matmul_topk(
                qj, snap["vectors"], k_scan,
                db_scales=snap["scales"],
                ns_tags=snap["ns"], canon_tags=snap["canon"],
                wants=wants,
                block_n=snap["bn"],
                assume_padded=True,
                mode=self.search_mode,
            )
        else:
            import jax

            fn = self._xla_fn_cache.get(k_scan)
            if fn is None:
                fn = jax.jit(lambda q, x, s, ns, canon, w: topk_xla_reference(
                    q, x, k_scan, db_scales=s, ns_tags=ns, canon_tags=canon,
                    want_ns=w[0, 0], want_canon=w[0, 1]))
                self._xla_fn_cache[k_scan] = fn
            sc, idx = fn(qj, snap["vectors"],
                         snap["scales"] if snap["scales"] is not None
                         else jnp.ones((snap["vectors"].shape[0],), jnp.float32),
                         snap["ns"], snap["canon"], wants)
        sc, idx = np.asarray(sc), np.asarray(idx)
        if k_scan > k:
            sc, idx = self._refine_exact(queries, sc, idx, snap, k)
        return self._to_result(sc, idx, snap)

    def _refine_exact(self, queries: np.ndarray, sc: np.ndarray, idx: np.ndarray,
                      snap: dict[str, Any], k: int) -> tuple[np.ndarray, np.ndarray]:
        """Re-score the (few) scanned candidates with the exact f32 master
        copy and keep the top k (int8 two-stage refine)."""
        rows_map = snap["rows"]
        out_sc = np.full((sc.shape[0], k), -np.inf, np.float32)
        out_idx = np.full((sc.shape[0], k), -1, np.int32)
        for qi in range(sc.shape[0]):
            valid = (idx[qi] >= 0) & np.isfinite(sc[qi])
            cand = idx[qi][valid]
            if len(cand) == 0:
                continue
            host_rows = rows_map[cand]
            exact = self._vectors[host_rows] @ queries[qi]
            order = np.argsort(-exact, kind="stable")[:k]
            out_sc[qi, : len(order)] = exact[order]
            out_idx[qi, : len(order)] = cand[order]
        return out_sc, out_idx

    def _to_result(self, sc: np.ndarray, idx: np.ndarray, snap: dict[str, Any]) -> SearchResult:
        res = SearchResult(ids=[], similarities=[], distances=[], rows=[], metadatas=[], documents=[])
        rows_map = snap["rows"]
        for qi in range(sc.shape[0]):
            ids_q, sim_q, dist_q, row_q, meta_q, doc_q = [], [], [], [], [], []
            for j in range(sc.shape[1]):
                r = int(idx[qi, j])
                s = float(sc[qi, j])
                if r < 0 or not np.isfinite(s):
                    continue
                host_row = int(rows_map[r])
                ids_q.append(self._ids[host_row])
                sim_q.append(s)
                dist_q.append(1.0 - s)
                row_q.append(host_row)
                meta_q.append(self._metadatas[host_row])
                doc_q.append(self._documents[host_row])
            res.ids.append(ids_q)
            res.similarities.append(sim_q)
            res.distances.append(dist_q)
            res.rows.append(row_q)
            res.metadatas.append(meta_q)
            res.documents.append(doc_q)
        return res

    # ------------------------------------------------------------- state (for persistence)

    def state(self) -> dict[str, Any]:
        with self._lock:
            return self._state_locked()

    def _state_locked(self) -> dict[str, Any]:
        live = np.flatnonzero(self._alive)
        return {
            "kind": self.kind,
            "dim": self.dim,
            "dtype": self.dtype,
            "metric": self.metric,
            "vectors": self._vectors[live],
            "ids": [self._ids[r] for r in live],
            "metadatas": [self._metadatas[r] for r in live],
            "documents": [self._documents[r] for r in live],
        }

    @classmethod
    def from_state(cls, state: dict[str, Any], **kw) -> "FlatIndex":
        idx = cls(state["dim"], dtype=state.get("dtype", "bfloat16"),
                  metric=state.get("metric", "cosine"), **kw)
        if len(state["ids"]):
            # vectors are already normalized; bypass re-normalization by direct add
            idx.add(state["ids"], state["vectors"], state["documents"], state["metadatas"])
        return idx

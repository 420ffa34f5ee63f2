"""Exact flat index resident in HBM.

Replaces the reference's Chroma collection (hnswlib HNSW ANN — reference
api/app.py:86-91) with a dense matrix in device memory searched by the fused
matmul+top-k kernel (tpu_rag/ops/topk.py).  Exact (recall 1.0) by
construction; the approximate/scale-out variants are IVFIndex and the
sharded search in tpu_rag/parallel.

Mutations (add/delete/upsert) are host-side numpy appends + tombstones,
mirroring how the reference's online indexer adds/deletes documents
(reference api/app.py:209-225,253-271).  The device snapshot is refreshed
lazily on the next search, and the refresh is INCREMENTAL: new rows stream
into a fixed-capacity device append block via dynamic_update_slice (transfer
O(new rows), like hnswlib's incremental insert — reference api/app.py:209-225),
and deletions flip the affected rows' filter tags to PAD_TAG in place
(transfer O(deleted rows)).  A full re-upload happens only when the append
block fills or tombstones accumulate past a threshold — so a single
/docs/save against a 10M-row corpus moves kilobytes, not gigabytes.
"""

from __future__ import annotations

import functools
import threading
import time
from dataclasses import dataclass, field

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from tpu_rag.index.arena import VectorArena
from tpu_rag.index.filter import TagVocab
from tpu_rag.index.rowmeta import RowIdMap, RowSeq
from tpu_rag.ops.quant import quantize_int8_rows
from tpu_rag.ops.topk import (PAD_TAG, fused_matmul_topk, packed_k_scan,
                              topk_xla_reference)

# Fixed chunk shapes keep these jitted updaters at one compilation each.
# No buffer donation: concurrent searches may still hold the previous
# snapshot's buffers (snapshot refresh is copy-on-write), so updates allocate
# fresh device arrays — the copies are device-side and O(block), never
# host->device traffic.
APPEND_GRANULE = 256
KILL_GRANULE = 64

# Added to int32 row ids before they are bitcast into the fused-path's f32
# readback (search_fused): id -1 maps to bitpattern 0x00800000 (the smallest
# normal positive float) and every id up to 2^31 - 2^24 - 2 (~2.130e9) stays
# a normal FINITE float — ids above that bias into the 0x7F800000+ inf/NaN
# patterns, which hardware may canonicalize.  Raw small ids are denormal
# bitpatterns that real TPU hardware flushes to zero (every served id read
# back as row 0 on v5e; see search_fused).
_ID_BIAS = 0x00800001


def refine_k_scan(dtype: str, refine_factor: int, k: int, n: int,
                  mode: str = "exact") -> int:
    """Candidate count for the two-stage refine (scan k_scan, re-score in
    f32 on host, keep top k).  int8 scans the full refine_factor*k —
    quantization error genuinely reorders candidates; bf16 only needs to
    recover rounding-order near-ties, so 2x oversampling suffices and halves
    the in-kernel top-k loop passes (the exact kernel's per-tile cost is
    linear in k_scan).  Recall for both is CI-gated >= 0.99
    (tests/test_incremental.py::test_int8_refine_recall_gate).

    mode="packed" (explicit opt-in only) selects at ~fp16 score resolution
    with index tie-breaks, so its oversample must cover the equal-key tie
    census, not just quantization reorder — packed_k_scan's floor (measured
    on v5e at 100K clustered rows, ops/topk.py).  The packed branch comes
    BEFORE the refine-off guard on purpose: an explicit search_mode='packed'
    with f32 storage or refine_factor=0 must still oversample + host-refine,
    or it reproduces the exact tie-flood recall loss (0.8031 recall@10)
    this function exists to prevent."""
    if mode == "packed":
        return packed_k_scan(k, n)
    if refine_factor <= 0 or dtype not in ("int8", "bfloat16"):
        return k
    f = refine_factor if dtype == "int8" else min(refine_factor, 2)
    return min(max(k * f, k), max(n, 1))


@jax.jit
def _append_chunk_device(vb, sb, nb, cb, new_vals, new_scales, new_ns, new_canon, offset):
    """Write one APPEND_GRANULE-row chunk into the device append block."""
    vb = jax.lax.dynamic_update_slice(vb, new_vals, (offset, 0))
    sb = jax.lax.dynamic_update_slice(sb, new_scales, (offset,))
    nb = jax.lax.dynamic_update_slice(nb, new_ns, (offset,))
    cb = jax.lax.dynamic_update_slice(cb, new_canon, (offset,))
    return vb, sb, nb, cb


@jax.jit
def _append_residual_device(rb, rsb, new_r, new_rs, offset):
    """Write one APPEND_GRANULE-row residual chunk into the append block."""
    rb = jax.lax.dynamic_update_slice(rb, new_r, (offset, 0))
    rsb = jax.lax.dynamic_update_slice(rsb, new_rs, (offset,))
    return rb, rsb


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("is_int8",))
def _upload_master_chunk(vals, scales, chunk, g, offset, *, is_int8):
    """Write one streamed-compaction chunk into the device snapshot arrays.
    `chunk` is (C, dim) f32 with rows >= g zero-padded; the int8 quantize /
    bf16 cast happens here on device.  Donation makes the update in place —
    no per-chunk copy of the (n_pad, dim) destination."""
    if is_int8:
        q, s = quantize_int8_rows(chunk)
        s = jnp.where(jnp.arange(chunk.shape[0]) < g, s, 0.0)
        vals = jax.lax.dynamic_update_slice(vals, q, (offset, 0))
        scales = jax.lax.dynamic_update_slice(scales, s, (offset,))
    else:
        vals = jax.lax.dynamic_update_slice(
            vals, chunk.astype(vals.dtype), (offset, 0))
    return vals, scales


@jax.jit
def _kill_tags_device(ns, canon, rows):
    """Tombstone device rows in place: PAD_TAG rows are filtered by every
    search kernel, so flipping the tags deletes without moving vectors."""
    ns = ns.at[rows].set(PAD_TAG)
    canon = canon.at[rows].set(PAD_TAG)
    return ns, canon


@jax.jit
def _kill_tags_2d_device(ns_lists, canon_lists, flat_rows):
    """Same as _kill_tags_device for (nlist, cap) IVF tag arrays, addressed
    by flattened slot index list*cap + slot."""
    shape = ns_lists.shape
    ns = ns_lists.reshape(-1).at[flat_rows].set(PAD_TAG).reshape(shape)
    canon = canon_lists.reshape(-1).at[flat_rows].set(PAD_TAG).reshape(shape)
    return ns, canon


def _quantize_int8_np(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side mirror of ops.quant.quantize_int8_rows for small chunks."""
    absmax = np.max(np.abs(x), axis=1)
    scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(x / scales[:, None]), -127, 127).astype(np.int8)
    return q, scales


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
        block_n: int = 10752,         # cap; default_block_n binds per mode
        search_mode: str = "auto",    # "auto" | "exact" | "bucketed"
        master_backing: str | None = None,  # ram | disk | auto (env default)
        master_dir: str | None = None,      # backing-file dir for disk/auto
        docmeta_backing: str | None = None,  # ram | disk (id/doc/meta rows)
    ) -> None:
        if metric not in ("cosine", "ip"):
            raise ValueError(f"unsupported metric: {metric}")
        if dtype not in ("bfloat16", "float32", "int8", "auto"):
            raise ValueError(f"unsupported index dtype: {dtype}")
        self.dim = dim
        # "auto" resolves per corpus size (see the dtype property): bf16
        # below auto_int8_min_rows, int8 at/above — at scale the scan is
        # HBM-bandwidth-bound, int8 halves the bytes, and the always-on
        # two-stage refine re-scores candidates in f32 (recall CI-gated
        # >= 0.99; VERDICT r2 #4 "int8-by-default >= 2M rows").
        self._dtype_cfg = dtype
        self.auto_int8_min_rows = 2_000_000
        self.metric = metric
        self.use_pallas = use_pallas
        self.block_n = block_n
        self.search_mode = search_mode
        # "auto" routes to the exact kernel below this row count and to the
        # one-pass bucketed kernel above it.  A bucketed miss needs two true
        # top-k members in the same 128-lane bucket: P ~ C(k,2)*128/n, so at
        # the 2M threshold structural recall@10 is already >= 0.997 and
        # rises with n (0.9997 at 20M) — while the exact kernel's k selection
        # passes over every tile make it VPU-bound at large n.
        self.auto_bucketed_min_rows = 2_000_000
        # measured on v5e: since the selection loop dropped its argmax
        # (ops/topk.py — max + eq + min-over-iota), the Pallas kernel beats
        # XLA at every scale that fits HBM (66.0K vs 64.7K QPS at 100K rows,
        # bench.py r2), so Pallas is the default whenever the backend
        # supports it.  The threshold remains settable for A/B runs.
        self.pallas_min_rows = 0
        # int8 two-stage refine: scan int8 for refine_factor*k candidates,
        # then exactly re-score those few rows with the f32 master copy
        # (recall 0.934 -> ~bf16-level at int8 scan cost). 0 disables.
        self.refine_factor = 4
        # Device-side refine (the serving fused path): keep an int8-quantized
        # RESIDUAL (x_f32 - dequant(stored)) next to the stored vectors and
        # re-score the scan's k_scan candidates on device in ~f32 precision
        # (reconstruction error ~stored-error/127).  The fused readback then
        # shrinks to k scores+ids (~80 B/query instead of ~1.7 KB with the
        # embedding + host refine) — the readback is the serving-throughput
        # cap on bandwidth-limited links.  Costs +1 byte/dim HBM; capped.
        self.device_refine = True
        self.device_refine_max_rows = 4_000_000

        # Host master copy: growable RAM/disk arena (beyond-host-RAM corpora
        # spill to an np.memmap — see tpu_rag/index/arena.py).  All reads go
        # through the `_vectors` property (a numpy view of the live range).
        self._arena = VectorArena(dim, backing=master_backing, dir=master_dir)
        # Per-row id/document/metadata + id->row map: RAM lists by default,
        # SQLite-backed with docmeta_backing="disk" (tpu_rag/index/rowmeta.py)
        # so 100M-row corpora don't hold tens of GB of interpreter objects.
        import os as _os
        docmeta_backing = docmeta_backing or _os.environ.get(
            "TPU_RAG_DOCMETA_BACKING", "ram")
        self._rowmeta = RowSeq(backing=docmeta_backing, dir=master_dir)
        self._id_to_row = RowIdMap(self._rowmeta)
        # tag/liveness arrays grow with doubled capacity (like the arena) —
        # a concatenate per add() is O(n) and quadratic under streaming
        # ingestion; `_tag_n` rows of the buffers are live, the properties
        # below expose exactly that prefix
        self._tag_n = 0
        self._ns_buf: np.ndarray = np.zeros((0,), np.int32)
        self._canon_buf: np.ndarray = np.zeros((0,), np.int32)
        self._alive_buf: np.ndarray = np.zeros((0,), bool)
        self.ns_vocab = TagVocab()
        self.canon_vocab = TagVocab()

        self._device: dict[str, Any] | None = None  # lazily built snapshot
        self._dirty = True
        self._wants_cache: dict[tuple[int, int], Any] = {}  # device arrays
        # wall-time split of the most recent search() call (bench reads it:
        # snapshot/bookkeeping vs device dispatch+readback vs host decode)
        self.last_search_stats: dict[str, float] | None = None
        self._xla_fn_cache: dict[int, Any] = {}  # jitted XLA search per k
        # incremental snapshot refresh: adds stream into a device append
        # block, deletes flip tags in place; a full re-upload happens only
        # when the block fills or tombstones pass max_dead_fraction
        self.incremental = True
        self.append_capacity = 4096            # rows before forced compaction
        self.max_dead_fraction = 0.3
        # reclaim host arena/row-store space for tombstoned rows whenever a
        # full device rebuild happens with > max_dead_fraction dead rows
        self.auto_vacuum = True
        self._pending_add: list[int] = []      # host rows awaiting device append
        self._pending_dead: list[int] = []     # host rows awaiting device kill
        self._append_rows: np.ndarray | None = None  # append slot -> host row
        self._append_slot: dict[int, int] = {}       # host row -> append slot
        self._dead_since_compact = 0
        self.snapshot_stats = {"full_rebuilds": 0, "incremental_appends": 0,
                               "incremental_kills": 0, "rows_uploaded_last": 0}
        # Stream the device-snapshot upload in chunks (instead of staging a
        # full (n_pad, dim) f32 copy host-side) once the staging buffer would
        # exceed this many bytes — required for masters that exceed host RAM.
        # Only takes effect above device_refine_max_rows (the residual-refine
        # snapshot needs the staged copy; at refine scale it is small).
        self.stream_upload_bytes = 4 << 30
        self.stream_upload_chunk = 131_072          # rows per streamed chunk
        # guards host-side state across concurrent requests (the reference
        # had unguarded shared mutable state — SURVEY.md §5 race detection)
        self._lock = threading.RLock()

    # Tag/liveness views: writable numpy views of the live prefix.  Bulk
    # replacement goes through _replace_tag_rows (one atomic length update);
    # appends through _append_tag_rows.  There are deliberately NO setters:
    # per-array assignment would leave the shared prefix length inconsistent.
    @property
    def _ns(self) -> np.ndarray:
        return self._ns_buf[: self._tag_n]

    @property
    def _canon(self) -> np.ndarray:
        return self._canon_buf[: self._tag_n]

    @property
    def _alive(self) -> np.ndarray:
        return self._alive_buf[: self._tag_n]

    @property
    def dtype(self) -> str:
        """Storage dtype, resolved: "auto" -> bf16 below auto_int8_min_rows,
        int8 at/above (device_snapshot rebuilds when a corpus crosses the
        threshold — the snapshot records the dtype it was built with)."""
        if self._dtype_cfg != "auto":
            return self._dtype_cfg
        return ("int8" if len(self._alive) and int(self._alive.sum()) >= self.auto_int8_min_rows
                else "bfloat16")

    @dtype.setter
    def dtype(self, value: str) -> None:
        self._dtype_cfg = value

    @property
    def dtype_config(self) -> str:
        """The configured (unresolved) dtype — what persistence records."""
        return self._dtype_cfg

    def _replace_tag_rows(self, ns, canon, alive) -> None:
        ns = np.asarray(ns, np.int32)
        canon = np.asarray(canon, np.int32)
        alive = np.asarray(alive, bool)
        if not (len(ns) == len(canon) == len(alive)):
            raise ValueError("tag array length mismatch")
        self._ns_buf, self._canon_buf, self._alive_buf = ns, canon, alive
        self._tag_n = len(ns)

    def _append_tag_rows(self, ns: np.ndarray, canon: np.ndarray) -> None:
        """Append g rows to the tag/liveness buffers (amortized O(g))."""
        g = len(ns)
        need = self._tag_n + g
        if need > len(self._ns_buf):
            cap = max(1024, 2 * len(self._ns_buf), need)
            for name, dtype in (("_ns_buf", np.int32), ("_canon_buf", np.int32),
                                ("_alive_buf", bool)):
                old = getattr(self, name)
                buf = np.zeros((cap,), dtype)
                buf[: len(old)] = old
                setattr(self, name, buf)
        self._ns_buf[self._tag_n : need] = ns
        self._canon_buf[self._tag_n : need] = canon
        self._alive_buf[self._tag_n : need] = True
        self._tag_n = need

    # Read views over the row store (RAM lists or SQLite — rowmeta.py).
    # They support [row], [row_list], len() and iteration; all writes go
    # through self._rowmeta / self._id_to_row.
    @property
    def _ids(self):
        return self._rowmeta.ids

    @property
    def _documents(self):
        return self._rowmeta.docs

    @property
    def _metadatas(self):
        return self._rowmeta.metas

    @property
    def _vectors(self) -> np.ndarray:
        """Live view of the host master rows (RAM or disk-backed)."""
        return self._arena.view

    @_vectors.setter
    def _vectors(self, arr: np.ndarray) -> None:
        # zero-copy adoption of e.g. a read-only memmap of a saved store
        # (tpu_rag/parallel/distributed.py, index/store.py load paths)
        self._arena.adopt(arr)

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
            # Batched lookups/drops: per-id pops cost one SQLite commit each
            # on the disk backing.
            existing = self._id_to_row.get_many(ids)
            for row in existing.values():
                self._alive[row] = False
                self._note_dead(row)
            self._id_to_row.drop_many(existing.keys())

            start = len(self._rowmeta)
            self._arena.append(vectors)
            ns = np.array([self.ns_vocab.intern(str(m.get("namespace", ""))) for m in metadatas], np.int32)
            canon = np.array([self.canon_vocab.intern(str(m.get("canonicality", ""))) for m in metadatas], np.int32)
            self._append_tag_rows(ns, canon)
            self._rowmeta.extend_rows(
                ids, [d or "" for d in documents],
                [dict(m or {}) for m in metadatas])
            self._id_to_row.set_many(
                (i, start + off) for off, i in enumerate(ids))
            self._note_added(range(start, start + len(ids)))

    upsert = add

    def _note_added(self, rows) -> None:
        """Stage freshly-added host rows for an incremental device append.
        Called under the lock.  Falls back to a full rebuild when the append
        block cannot absorb them (reserving one granule of slack so chunked
        dynamic_update_slice writes never run past the block)."""
        if self._dirty or self._device is None or not self.incremental:
            self._dirty = True
            return
        rows = list(rows)
        fill = int(self._device.get("a_fill", 0))
        if fill + len(self._pending_add) + len(rows) > self.append_capacity - APPEND_GRANULE:
            self._dirty = True
            self._pending_add.clear()
            return
        self._pending_add.extend(rows)

    def _note_dead(self, row: int) -> None:
        """Stage a tombstoned host row for an in-place device tag kill.
        Called under the lock."""
        self._dead_since_compact += 1
        if self._dirty or self._device is None or not self.incremental:
            self._dirty = True
            return
        if self._dead_since_compact > self.max_dead_fraction * max(len(self._rowmeta), 1):
            self._dirty = True  # reclaim tombstoned rows with a full compact
            return
        if row in self._append_slot or self._pending_add.count(row) == 0:
            self._pending_dead.append(row)
        # rows still waiting in _pending_add are dropped before upload
        self._pending_add = [r for r in self._pending_add if r != row]

    def delete(self, ids: list[str] | None = None, where: dict | None = None) -> int:
        """Delete by explicit ids and/or metadata equality (parity with
        Chroma collection.delete(ids=...) / delete(where={'source_key': ...}),
        reference api/app.py:264-271,290-315)."""
        n = 0
        with self._lock:
            if ids:
                found = self._id_to_row.get_many(ids)
                for row in found.values():
                    self._alive[row] = False
                    self._note_dead(row)
                    n += 1
                self._id_to_row.drop_many(found.keys())
            if where:
                # streamed row-order scan: RAM bounded by one rowmeta batch
                # even with the SQLite backing (beyond-RAM corpora); id-map
                # drops batched into one transaction (per-row pops cost one
                # SQLite commit each on the disk backing)
                drop: list[str] = []
                for row, rid, _doc, meta in self._rowmeta.iter_rows():
                    if not self._alive[row]:
                        continue
                    if all(str(meta.get(k)) == str(v) for k, v in where.items()):
                        self._alive[row] = False
                        drop.append(rid)
                        self._note_dead(row)
                        n += 1
                if drop:
                    self._id_to_row.drop_many(drop)
        return n

    def count(self) -> int:
        return int(self._alive.sum())

    def compact(self) -> None:
        """Force a full device-snapshot rebuild on the next search: reclaims
        tombstoned rows' HBM and (for IVF) re-clusters absorbed appends."""
        with self._lock:
            self._dirty = True

    def vacuum(self) -> int:
        """Reclaim the HOST storage of tombstoned rows: stream live rows
        into fresh arena / row stores and renumber.  The device snapshot
        already drops dead rows on its own full rebuilds (max_dead_fraction),
        but without a vacuum the host master grows without bound under
        upsert churn — hnswlib had the same gap (deleted elements stay in
        the graph); this is the TPU-native fix.  Returns rows reclaimed.

        Host row NUMBERS change; SearchResult.rows values obtained before a
        vacuum are stale afterwards (ids remain the stable handle, matching
        the reference's contract — reference api/app.py:209-315 addresses
        everything by doc id)."""
        with self._lock:
            live = np.flatnonzero(self._alive)
            dead = len(self._rowmeta) - len(live)
            if dead == 0:
                return 0
            new_arena = VectorArena(self.dim, backing=self._arena.policy,
                                    dir=self._arena._dir,
                                    spill_bytes=self._arena.spill_bytes)
            new_rows = RowSeq(backing=self._rowmeta.backing,
                              dir=self._arena._dir)
            new_map = RowIdMap(new_rows)
            CH = 8192
            src = self._vectors
            for i in range(0, len(live), CH):
                part = live[i:i + CH]
                new_arena.append(src[part])
                rows = self._rowmeta.rows(part.tolist())
                start = new_rows.extend_rows(
                    [t[0] for t in rows], [t[1] for t in rows],
                    [t[2] for t in rows])
                new_map.set_many(
                    (t[0], start + off) for off, t in enumerate(rows))
            # No explicit close of the old arena/row store: in-flight
            # searches may still read them through the snapshot they hold
            # (snapshots carry *_ref generation pointers — device_snapshot);
            # the backing files are deleted by GC finalizers once the last
            # snapshot referencing them is dropped.
            self._arena = new_arena
            self._rowmeta = new_rows
            self._id_to_row = new_map
            self._replace_tag_rows(self._ns[live], self._canon[live],
                                   np.ones(len(live), bool))
            self._dirty = True           # next search rebuilds the snapshot
            self._pending_add.clear()
            self._pending_dead.clear()
            self._dead_since_compact = 0
            self._on_vacuum()            # subclasses drop stale row-number state
            return dead

    def _on_vacuum(self) -> None:
        """Hook: host row NUMBERS changed — subclasses must drop any derived
        state keyed by old row numbers (IVF list membership etc.)."""

    def get(self, id_: str) -> dict | None:
        # under the lock: a concurrent vacuum renumbers rows between the
        # id->row lookup and the row-store read
        with self._lock:
            row = self._id_to_row.get(id_)
            if row is None:
                return None
            _rid, doc, meta = self._rowmeta.row(row)
            return {
                "id": id_,
                "document": doc,
                "metadata": meta,
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
        # tile height is mode-dependent (the bucketed epilogue affords
        # double-height tiles — see default_block_n); the snapshot is padded
        # for the mode this corpus size will actually search with
        bn = default_block_n(self.dim, dtype_bytes, self.block_n,
                             mode=self.effective_search_mode(n))
        n_pad = max(bn, -(-n // bn) * bn)

        ns = np.full((n_pad,), PAD_TAG, np.int32)
        canon = np.full((n_pad,), PAD_TAG, np.int32)
        ns[:n] = self._ns[live]
        canon[:n] = self._canon[live]

        snap: dict[str, Any] = {
            "rows": live,                      # device row -> host row (ascending)
            "ns": jnp.asarray(ns),
            "canon": jnp.asarray(canon),
            "n": n,
            "n_pad": n_pad,
            "bn": bn,
        }
        if (not self._use_device_refine(n_pad)
                and n_pad * self.dim * 4 > self.stream_upload_bytes):
            # masters at/beyond host-RAM scale: upload in chunks instead of
            # staging a full (n_pad, dim) f32 copy (see stream_upload_bytes)
            self._upload_vectors_streamed(snap, live, n, n_pad)
            if self.incremental:
                self._alloc_append_block(snap)
            return snap
        vecs = np.zeros((n_pad, self.dim), np.float32)
        vecs[:n] = self._vectors[live]
        if self.dtype == "int8":
            vals, scales = quantize_int8_rows(jnp.asarray(vecs))
            scales = scales.at[n:].set(0.0) if n_pad > n else scales
            snap["vectors"] = vals
            snap["scales"] = scales
            if self._use_device_refine(n_pad):
                q8, s8 = _quantize_int8_np(vecs)  # host mirror of the device quant
                recon = q8.astype(np.float32) * s8[:, None]
                self._attach_residual(snap, vecs - recon)
        else:
            jdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            snap["vectors"] = jnp.asarray(vecs, dtype=jdt)
            # resident ones: both search paths take scales as a traced arg
            # (a per-call jnp.ones would cost one dispatch per search)
            snap["scales"] = jnp.ones((n_pad,), jnp.float32)
            if self.dtype == "bfloat16" and self._use_device_refine(n_pad):
                import ml_dtypes
                recon = vecs.astype(ml_dtypes.bfloat16).astype(np.float32)
                self._attach_residual(snap, vecs - recon)
        if self.incremental:
            self._alloc_append_block(snap)
        return snap

    def _upload_vectors_streamed(self, snap: dict[str, Any], live: np.ndarray,
                                 n: int, n_pad: int) -> None:
        """Chunked host->device upload of the master rows: peak extra host
        RAM is one (stream_upload_chunk, dim) f32 staging buffer instead of
        a full (n_pad, dim) copy — the compaction path for disk-backed
        masters that exceed host RAM.  The int8 quantize / bf16 cast happens
        on device per chunk; buffer donation keeps the per-chunk update in
        place (device traffic O(n), not O(n * chunks))."""
        is_int8 = self.dtype == "int8"
        jdt = (jnp.int8 if is_int8
               else jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32)
        vals = jnp.zeros((n_pad, self.dim), jdt)
        # int8 pad rows keep scale 0 (parity with the staged path); resident
        # bf16/f32 scales are all-ones (see _compact)
        scales = (jnp.zeros((n_pad,), jnp.float32) if is_int8
                  else jnp.ones((n_pad,), jnp.float32))
        c = min(self.stream_upload_chunk, n_pad)
        i = 0
        while i < n:
            # dynamic_update_slice CLAMPS out-of-range starts: a tail chunk
            # written at offset > n_pad - c would silently shift backwards
            # over live rows.  Pin the final offset to n_pad - c and refill
            # the whole window — rewriting the overlap with identical values
            # is idempotent, and positions >= n in the window are padding.
            off = min(i, n_pad - c)
            rows = live[off:min(off + c, n)]
            g = len(rows)
            # fresh staging buffer per chunk: on the CPU backend
            # jnp.asarray can ALIAS the numpy buffer zero-copy, and jax
            # dispatch is async — refilling a reused buffer races the
            # in-flight chunk's read (observed as flaky tail corruption in
            # test_streamed_compact_tail_clamp)
            stage = np.zeros((c, self.dim), np.float32)
            stage[:g] = self._vectors[rows]
            vals, scales = _upload_master_chunk(
                vals, scales, jnp.asarray(stage), jnp.int32(g), jnp.int32(off),
                is_int8=is_int8)
            i = off + c
        snap["vectors"] = vals
        snap["scales"] = scales
        self.snapshot_stats["streamed_uploads"] = (
            self.snapshot_stats.get("streamed_uploads", 0) + 1)

    def _use_device_refine(self, n_pad: int) -> bool:
        return (self.device_refine and self.refine_factor > 0
                and n_pad <= self.device_refine_max_rows)

    def _attach_residual(self, snap: dict[str, Any], res: np.ndarray) -> None:
        """int8-quantize the storage residual (x_f32 - dequant(stored)) and
        keep it on device: the fused path re-scores candidates as
        stored + residual ~ f32 (reconstruction rel err ~1e-5 for bf16)."""
        r8, rs = _quantize_int8_np(res)
        rs = rs.copy()
        rs[~(np.abs(res).max(axis=1) > 0)] = 0.0  # exact rows: no correction
        snap["r_vectors"] = jnp.asarray(r8)
        snap["r_scales"] = jnp.asarray(rs)

    def _alloc_append_block(self, snap: dict[str, Any]) -> None:
        """Attach an empty fixed-capacity append block to a fresh snapshot."""
        cap = self.append_capacity
        jdt = (jnp.int8 if self.dtype == "int8"
               else jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32)
        snap["a_vectors"] = jnp.zeros((cap, self.dim), jdt)
        snap["a_scales"] = jnp.zeros((cap,), jnp.float32)
        snap["a_ns"] = jnp.full((cap,), PAD_TAG, jnp.int32)
        snap["a_canon"] = jnp.full((cap,), PAD_TAG, jnp.int32)
        snap["a_fill"] = 0
        if "r_vectors" in snap:
            snap["a_r_vectors"] = jnp.zeros((cap, self.dim), jnp.int8)
            snap["a_r_scales"] = jnp.zeros((cap,), jnp.float32)
        self._append_rows = np.full((cap,), -1, np.int64)
        self._append_slot = {}
        # generation-pin the slot->host-row map on the snapshot: a rebuild
        # (possibly after a vacuum that renumbered rows) allocates a FRESH
        # map, and lock-free readers must resolve append hits through the
        # map of the generation they hold (same rationale as rowmeta_ref)
        snap["a_rows_map"] = self._append_rows

    def device_snapshot(self) -> dict[str, Any]:
        with self._lock:
            if (self._device is not None and not self._dirty
                    and self._device.get("dtype", self.dtype) != self.dtype):
                self._dirty = True  # auto dtype crossed its row threshold
            if self._dirty or self._device is None:
                # a full rebuild is the natural moment to also reclaim the
                # HOST copies of tombstoned rows (vacuum renumbers, and the
                # compact right below rebuilds the device maps to match)
                if self.auto_vacuum:
                    dead = len(self._rowmeta) - int(self._alive.sum())
                    if dead > self.max_dead_fraction * max(len(self._rowmeta), 1):
                        self.vacuum()
                self._device = self._compact()
                # generation pointers: a vacuum RENUMBERS host rows and swaps
                # in fresh stores — readers resolve rows through the stores
                # their snapshot was built from, never the current ones
                self._device["rowmeta_ref"] = self._rowmeta
                self._device["arena_ref"] = self._arena
                # the dtype this snapshot was built with ("auto" indexes
                # rebuild when the resolved dtype flips; the incremental
                # flushes quantize/cast for the SNAPSHOT's dtype)
                self._device["dtype"] = self.dtype
                self._dirty = False
                self._pending_add.clear()
                self._pending_dead.clear()
                self._dead_since_compact = 0
                self.snapshot_stats["full_rebuilds"] += 1
                self.snapshot_stats["rows_uploaded_last"] = self._device["n"]
            elif self._pending_dead or self._pending_add:
                # copy-on-write: in-flight searches keep a consistent view of
                # the previous snapshot (and its still-valid buffers)
                snap = dict(self._device)
                if self._pending_dead:
                    self._flush_kills(snap)
                if self._pending_add:
                    self._flush_appends(snap)
                self._device = snap
            return self._device

    def _flush_kills(self, snap: dict[str, Any]) -> None:
        """Flip tombstoned rows' tags to PAD_TAG in place on device —
        transfer O(deleted rows), no vector movement."""
        base_rows, append_rows = [], []
        for hr in self._pending_dead:
            slot = self._append_slot.get(hr)
            if slot is not None:
                append_rows.append(slot)
                continue
            pos = int(np.searchsorted(snap["rows"], hr))
            if pos < len(snap["rows"]) and snap["rows"][pos] == hr:
                base_rows.append(pos)
        self._pending_dead.clear()
        for target, rows in (("", base_rows), ("a_", append_rows)):
            if not rows:
                continue
            arr = np.asarray(rows, np.int32)
            for i in range(0, len(arr), KILL_GRANULE):
                chunk = arr[i:i + KILL_GRANULE]
                if len(chunk) < KILL_GRANULE:  # pad with a repeat (idempotent set)
                    chunk = np.concatenate([chunk, np.full(KILL_GRANULE - len(chunk),
                                                           chunk[0], np.int32)])
                snap[target + "ns"], snap[target + "canon"] = self._kill_tags_target(
                    snap, target, jnp.asarray(chunk))
            self.snapshot_stats["incremental_kills"] += len(rows)

    def _kill_tags_target(self, snap: dict[str, Any], target: str, chunk):
        """Tag-kill one KILL_GRANULE chunk of device rows on the `target`
        arrays ("" = base snapshot, "a_" = append block).  Sharded subclasses
        override the base target with a shard-local scatter."""
        return _kill_tags_device(snap[target + "ns"], snap[target + "canon"], chunk)

    def _flush_appends(self, snap: dict[str, Any]) -> None:
        """Stream pending host rows into the device append block in fixed
        APPEND_GRANULE chunks — transfer O(new rows), one compiled updater."""
        rows = [r for r in self._pending_add if self._alive[r]]
        self._pending_add.clear()
        if not rows:
            return
        fill = int(snap["a_fill"])
        uploaded = 0
        for i in range(0, len(rows), APPEND_GRANULE):
            chunk_rows = rows[i:i + APPEND_GRANULE]
            g = len(chunk_rows)
            vecs = np.zeros((APPEND_GRANULE, self.dim), np.float32)
            vecs[:g] = self._vectors[chunk_rows]
            ns = np.full((APPEND_GRANULE,), PAD_TAG, np.int32)
            canon = np.full((APPEND_GRANULE,), PAD_TAG, np.int32)
            ns[:g] = self._ns[chunk_rows]
            canon[:g] = self._canon[chunk_rows]
            snap_dtype = snap.get("dtype", self.dtype)
            if snap_dtype == "int8":
                vals, scales = _quantize_int8_np(vecs)
                scales[g:] = 0.0
                recon = vals.astype(np.float32) * scales[:, None]
            else:
                vals = vecs.astype(jnp.bfloat16 if snap_dtype == "bfloat16" else np.float32)
                scales = np.ones((APPEND_GRANULE,), np.float32)
                recon = vals.astype(np.float32)
            (snap["a_vectors"], snap["a_scales"], snap["a_ns"],
             snap["a_canon"]) = _append_chunk_device(
                snap["a_vectors"], snap["a_scales"], snap["a_ns"], snap["a_canon"],
                jnp.asarray(vals), jnp.asarray(scales), jnp.asarray(ns),
                jnp.asarray(canon), jnp.int32(fill))
            if "a_r_vectors" in snap:
                r8, rs = _quantize_int8_np(vecs - recon)
                rs = rs.copy()
                rs[~(np.abs(vecs - recon).max(axis=1) > 0)] = 0.0
                snap["a_r_vectors"], snap["a_r_scales"] = _append_residual_device(
                    snap["a_r_vectors"], snap["a_r_scales"],
                    jnp.asarray(r8), jnp.asarray(rs), jnp.int32(fill))
            for off, hr in enumerate(chunk_rows):
                self._append_rows[fill + off] = hr
                self._append_slot[hr] = fill + off
            fill += g
            uploaded += g
        snap["a_fill"] = fill
        self.snapshot_stats["incremental_appends"] += 1
        self.snapshot_stats["rows_uploaded_last"] = uploaded

    # ------------------------------------------------------------- search

    def effective_search_mode(self, n: int) -> str:
        """Resolve "auto" per corpus size: below auto_bucketed_min_rows the
        per-tile exact top-k kernel (recall 1.0 by construction); above the
        threshold, one-pass bucketed (structural recall >= 0.997 at the
        threshold and rising with n — see __init__).

        "packed" is NEVER auto-selected: its (score|index) key selects at
        ~fp16 score resolution with index tie-breaks, and the tie census
        grows with corpus density per score-ulp — BENCH_r03 measured
        recall@10 0.8031 on real v5e at 100K clustered rows when packed was
        the auto default with a 2k oversample, while the exact kernel at
        the same scale measured recall 1.0 at HIGHER QPS (63.2K vs 56.6K).
        Packed remains available as an explicit opt-in (search_mode=
        "packed") with the packed_k_scan oversample, for callers who have
        validated its recall on their own score distribution (hardware
        recall gate: bench.py paths_recall)."""
        if self.search_mode != "auto":
            return self.search_mode
        if n >= self.auto_bucketed_min_rows:
            return "bucketed"
        return "exact"

    def _scan_refine_core(self, *, use_pallas: bool, bn: int, mode: str,
                          k_scan: int, k: int, k_out: int, n_pad: int,
                          have_append: bool, dev_refine: bool):
        """Traceable scan -> append-block scan -> device residual refine.

        The single compiled body behind BOTH serving entry points:
        search_fused (encoder forward fused in front) and the direct
        search() device path (pre-embedded queries).  Returns (sc, ii) —
        top-k_out scores and device ids (append rows at n_pad + slot).
        """

        def core(q, x, s, ns_t, canon_t, w, extras):
            if use_pallas:
                sc, ii = fused_matmul_topk(
                    q, x, k_scan, db_scales=s, ns_tags=ns_t,
                    canon_tags=canon_t, wants=w, assume_padded=True,
                    block_n=bn, mode=mode)
            else:
                sc, ii = topk_xla_reference(
                    q, x, k_scan, db_scales=s, ns_tags=ns_t,
                    canon_tags=canon_t, want_ns=w[0, 0],
                    want_canon=w[0, 1])
            ii = ii.astype(jnp.int32)
            if have_append:
                # scan the (fixed-capacity, mostly PAD) append block in
                # the SAME executable; its ids live at n_pad + slot
                k_a = min(k_scan, extras["a_vectors"].shape[0])
                sc_a, ii_a = topk_xla_reference(
                    q, extras["a_vectors"], k_a,
                    db_scales=extras["a_scales"], ns_tags=extras["a_ns"],
                    canon_tags=extras["a_canon"], want_ns=w[0, 0],
                    want_canon=w[0, 1])
                ii_a = jnp.where(ii_a >= 0, ii_a.astype(jnp.int32) + n_pad,
                                 -1)
                sc = jnp.concatenate([sc, sc_a], axis=1)
                ii = jnp.concatenate([ii, ii_a], axis=1)
            if dev_refine:
                # residual refine on device: stored + int8 residual ~ f32
                # (rel err ~1e-5); re-score every candidate with the f32
                # query, keep the top k
                safe = jnp.clip(ii, 0, n_pad - 1)
                cand = (x[safe].astype(jnp.float32)
                        * s[safe][..., None]
                        + extras["r_vectors"][safe].astype(jnp.float32)
                        * extras["r_scales"][safe][..., None])
                if have_append:
                    slot = jnp.clip(ii - n_pad, 0,
                                    extras["a_vectors"].shape[0] - 1)
                    cand_a = (extras["a_vectors"][slot].astype(jnp.float32)
                              * extras["a_scales"][slot][..., None]
                              + extras["a_r_vectors"][slot].astype(jnp.float32)
                              * extras["a_r_scales"][slot][..., None])
                    cand = jnp.where((ii >= n_pad)[..., None], cand_a, cand)
                exact = jnp.einsum("qd,qkd->qk", q, cand,
                                   preferred_element_type=jnp.float32)
                exact = jnp.where((ii >= 0) & jnp.isfinite(sc), exact,
                                  -jnp.inf)
                sc, pos = jax.lax.top_k(exact, k)
                ii = jnp.take_along_axis(ii, pos, axis=1)
            else:
                merged = min(k_out, sc.shape[1])
                sc, pos = jax.lax.top_k(sc, merged)
                ii = jnp.take_along_axis(ii, pos, axis=1)
            return sc, ii

        return core

    def _refine_extras(self, snap: dict[str, Any], *, have_append: bool,
                       dev_refine: bool) -> dict[str, Any]:
        """Snapshot slices the scan core needs, keyed as it expects them."""
        extras: dict[str, Any] = {}
        if have_append:
            for e in ("a_vectors", "a_scales", "a_ns", "a_canon"):
                extras[e] = snap[e]
        if dev_refine:
            extras["r_vectors"] = snap["r_vectors"]
            extras["r_scales"] = snap["r_scales"]
            if have_append:
                extras["a_r_vectors"] = snap["a_r_vectors"]
                extras["a_r_scales"] = snap["a_r_scales"]
        return extras

    def search(
        self,
        queries: np.ndarray,
        k: int,
        *,
        namespace: str | None = None,
        canonicality: str | None = None,
    ) -> SearchResult:
        t_enter = time.perf_counter()
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
        # two-stage refine: oversample candidates on the quantized scan and
        # re-score that handful exactly below.  int8 uses refine_factor;
        # bf16 (exact AND bucketed modes) uses a fixed 2x oversample;
        # explicit packed mode widens to packed_k_scan (tie-census cover) —
        # see refine_k_scan and the recall gates in tests/test_incremental.py.
        use_pallas_path = (self.use_pallas
                           and snap["n_pad"] >= self.pallas_min_rows)
        mode = self.effective_search_mode(snap["n"]) if use_pallas_path else "exact"
        k_scan = refine_k_scan(snap.get("dtype", self.dtype),
                               self.refine_factor, k, snap["n"], mode=mode)
        # cache the filter pair as a device array: a fresh host->device
        # transfer per search costs a full RTT on tunneled backends
        wants = self._wants_cache.get((want_ns, want_canon))
        if wants is None:
            wants = jnp.array([[want_ns, want_canon]], jnp.int32)
            self._wants_cache[(want_ns, want_canon)] = wants
        # device residual refine + in-executable append scan (same compiled
        # body as search_fused): ONE dispatch and ONE packed readback per
        # search instead of scan-readback + host f32 gather + per-query
        # numpy re-score — the host refine alone held FlatIndex.search() at
        # ~491 QPS at 2.5M rows (BENCH_r04 auto_dtype_2m5) while the raw
        # kernel did 7,358
        n_pad = snap["n_pad"]
        dev_refine = "r_vectors" in snap and k_scan > k
        have_append = "a_vectors" in snap
        k_out = k if dev_refine else k_scan
        key = ("direct", k, k_scan, snap["bn"], mode, use_pallas_path,
               dev_refine, have_append)
        fn = self._xla_fn_cache.get(key)
        if fn is None:
            core = self._scan_refine_core(
                use_pallas=use_pallas_path, bn=snap["bn"], mode=mode,
                k_scan=k_scan, k=k, k_out=k_out, n_pad=n_pad,
                have_append=have_append, dev_refine=dev_refine)

            def impl(q, x, s, ns_t, canon_t, w, extras):
                sc, ii = core(q, x, s, ns_t, canon_t, w, extras)
                # one packed readback: scores | bitcast biased ids (see
                # search_fused on _ID_BIAS — raw ids < 2^23 bitcast to
                # denormals that real TPU hardware flushes to zero)
                return jnp.concatenate(
                    [sc, jax.lax.bitcast_convert_type(
                        ii + jnp.int32(_ID_BIAS), jnp.float32)], axis=1)

            # mode "packed" only ever arrives here by EXPLICIT opt-in
            # (auto resolves exact/bucketed — effective_search_mode), so
            # kernel failures surface to the caller unwrapped
            fn = jax.jit(impl)
            self._xla_fn_cache[key] = fn
        extras = self._refine_extras(snap, have_append=have_append,
                                     dev_refine=dev_refine)
        t_disp = time.perf_counter()
        packed = np.asarray(fn(qj, snap["vectors"], snap["scales"],
                               snap["ns"], snap["canon"], wants, extras))
        t_done = time.perf_counter()
        sc = packed[:, :k_out].copy()
        idx = (np.ascontiguousarray(packed[:, k_out:2 * k_out])
               .view(np.int32) - _ID_BIAS)
        in_append = idx >= n_pad
        hrows = self._device_to_host_rows(sc, np.where(in_append, -1, idx),
                                          snap["rows"], snap["n"])
        if have_append and in_append.any():
            rows_map = snap.get("a_rows_map", self._append_rows)
            slots = np.clip(idx - n_pad, 0, len(rows_map) - 1)
            hrows = np.where(in_append & np.isfinite(sc),
                             rows_map[slots], hrows)
        if snap.get("a_fill", 0) > 0 and not have_append:
            sc, hrows = self._merge_append_block(qj, sc, hrows, snap,
                                                 k_scan, wants)
        if k_scan > k and not dev_refine:
            sc, hrows = self._refine_exact(queries, sc, hrows, k, snap=snap)
        out = self._to_result(sc, hrows, snap=snap)
        t_end = time.perf_counter()
        self.last_search_stats = {
            "prep_s": t_disp - t_enter,          # snapshot + glue
            "device_s": t_done - t_disp,         # dispatch + device + readback
            "decode_s": t_end - t_done,          # id decode + result build
        }
        return out

    def search_fused(self, forward, fkey, params, ids, mask, nq: int, k: int,
                     *, namespace: str | None = None,
                     canonicality: str | None = None,
                     return_qv: bool = True):
        """One-dispatch embed+search: `forward(params, ids, mask) -> (B, dim)
        float32, L2-normalized` (a traceable encoder forward, e.g.
        BiEncoder.fused_forward) is compiled INTO the same executable as the
        top-k scan, so a cold /search costs one device round-trip instead of
        two (embed, then search) — each dispatch is a full RTT on tunneled
        backends.  `fkey` identifies the forward in the jit cache; `nq` is
        the number of real (non-padding) query rows in the batch.

        `mask` may be None when the forward derives the attention mask from
        the ids on device (BiEncoder.fused_forward_ids) — halves the upload.
        `return_qv=False` drops the embeddings from the packed readback
        (scores+ids only, ~10x fewer bytes per query — the readback is the
        serving throughput cap on bandwidth-limited links); the second
        element of the return value is then None.

        Returns (SearchResult, qvecs (nq, dim) np.float32 | None) — or None
        when the caller must fall back to the two-step path (empty index or
        a filter tag this index has never seen).
        """
        want_ns = self.ns_vocab.lookup(namespace)
        want_canon = self.canon_vocab.lookup(canonicality)
        if want_ns == -2 or want_canon == -2 or self.count() == 0:
            return None
        snap = self.device_snapshot()
        n_pad = snap["n_pad"]
        use_pallas = self.use_pallas and n_pad >= self.pallas_min_rows
        mode = self.effective_search_mode(snap["n"]) if use_pallas else "exact"
        k_scan = refine_k_scan(snap.get("dtype", self.dtype),
                               self.refine_factor, k, snap["n"], mode=mode)
        wants = self._wants_2d(want_ns, want_canon)
        b, t = ids.shape
        # the device-side residual refine keeps recall at the host-refine
        # level without reading the query embeddings back; when the snapshot
        # has no residuals (f32 storage, refine disabled, or an oversized
        # corpus), fall back to the host refine, which needs qv
        dev_refine = "r_vectors" in snap and k_scan > k
        have_append = "a_vectors" in snap
        host_refine = k_scan > k and not dev_refine
        ret_qv = return_qv or host_refine or (
            snap.get("a_fill", 0) > 0 and not have_append)
        k_out = k if dev_refine else k_scan
        key = ("fused", fkey, b, t, k_scan, snap["bn"], mode, use_pallas,
               mask is None, ret_qv, str(np.asarray(ids).dtype),
               dev_refine, have_append)
        fn = self._xla_fn_cache.get(key)
        if fn is None:
            core = self._scan_refine_core(
                use_pallas=use_pallas, bn=snap["bn"], mode=mode,
                k_scan=k_scan, k=k, k_out=k_out, n_pad=n_pad,
                have_append=have_append, dev_refine=dev_refine)

            def impl(params, tids, tmask, x, s, ns_t, canon_t, w, extras):
                q = forward(params, tids, tmask)
                sc, ii = core(q, x, s, ns_t, canon_t, w, extras)
                # pack (scores | bitcast ids | embeddings?) into ONE f32
                # array: a single host readback instead of three — each
                # separate np.asarray sync costs a full RTT on tunneled
                # backends.  Index values are bounded by n_pad + capacity, so
                # the int32 cast is lossless even under jax_enable_x64 (where
                # topk yields int64 and a raw bitcast would grow an axis).
                #
                # _ID_BIAS before the bitcast: raw ids < 2^23 bitcast to
                # DENORMAL f32 and id -1 to a NaN — real TPU hardware
                # flushes denormals to zero in data movement, so every
                # served id decoded as row 0 on v5e (caught by the round-4
                # serving-path recall gate, bench.py e2e_recall_at_10; CPU
                # CI preserved the bit patterns and never saw it).  The
                # bias maps [-1, 2^31 - 2^24 - 2) onto normal positive
                # FINITE float bitpatterns, which every backend moves
                # losslessly (ids above that bound would bias into the
                # 0x7F800000+ inf/NaN range).
                parts = [sc, jax.lax.bitcast_convert_type(
                    ii + jnp.int32(_ID_BIAS), jnp.float32)]
                if ret_qv:
                    parts.append(q)
                return jnp.concatenate(parts, axis=1)

            fn = jax.jit(impl)
            self._xla_fn_cache[key] = fn
        extras = self._refine_extras(snap, have_append=have_append,
                                     dev_refine=dev_refine)
        # mode "packed" only ever arrives here by explicit opt-in (auto
        # resolves exact/bucketed), so kernel failures surface unwrapped
        packed = np.asarray(fn(params, jnp.asarray(ids),
                               None if mask is None else jnp.asarray(mask),
                               snap["vectors"], snap["scales"],
                               snap["ns"], snap["canon"], wants,
                               extras))[:nq]
        sc = packed[:, :k_out].copy()
        idx = (np.ascontiguousarray(packed[:, k_out:2 * k_out])
               .view(np.int32) - _ID_BIAS)
        qv_np = packed[:, 2 * k_out:].copy() if ret_qv else None
        # device ids -> host rows: base rows via the snapshot map, append
        # rows (>= n_pad) via the append-slot map
        in_append = idx >= n_pad
        hrows = self._device_to_host_rows(sc, np.where(in_append, -1, idx),
                                          snap["rows"], snap["n"])
        if have_append and in_append.any():
            rows_map = snap.get("a_rows_map", self._append_rows)
            slots = np.clip(idx - n_pad, 0, len(rows_map) - 1)
            hrows = np.where(in_append & np.isfinite(sc),
                             rows_map[slots], hrows)
        if snap.get("a_fill", 0) > 0 and not have_append:
            sc, hrows = self._merge_append_block(jnp.asarray(qv_np), sc, hrows,
                                                 snap, k_scan, wants)
        if host_refine:
            sc, hrows = self._refine_exact(qv_np, sc, hrows, k, snap=snap)
        return self._to_result(sc, hrows, snap=snap), (qv_np if return_qv else None)

    def _search_append_block(self, qj, snap: dict[str, Any], k_scan: int):
        """Scan the (small) device append block with the cached XLA path."""
        k_a = min(k_scan, snap["a_fill"])
        fn = self._xla_fn_cache.get(("append", k_a))
        if fn is None:
            fn = jax.jit(lambda q, x, s, ns, canon, w: topk_xla_reference(
                q, x, k_a, db_scales=s, ns_tags=ns, canon_tags=canon,
                want_ns=w[0, 0], want_canon=w[0, 1]))
            self._xla_fn_cache[("append", k_a)] = fn
        return fn

    def _merge_append_block(self, qj, sc: np.ndarray, hrows: np.ndarray,
                            snap: dict[str, Any], k_scan: int, wants):
        """Scan the append block and merge its hits with the base results in
        host-row space (score-desc, stable)."""
        fn = self._search_append_block(qj, snap, k_scan)
        sc_a, idx_a = fn(qj, snap["a_vectors"], snap["a_scales"],
                         snap["a_ns"], snap["a_canon"], wants)
        sc_a, idx_a = np.asarray(sc_a), np.asarray(idx_a)
        # resolve through the snapshot's own slot->row map generation
        rows_map = snap.get("a_rows_map", self._append_rows)
        hrows_a = np.where(
            (idx_a >= 0) & np.isfinite(sc_a),
            rows_map[np.clip(idx_a, 0, len(rows_map) - 1)], -1)
        all_sc = np.concatenate([sc, sc_a], axis=1)
        all_hr = np.concatenate([hrows, hrows_a], axis=1)
        all_sc = np.where(all_hr >= 0, all_sc, -np.inf)
        order = np.argsort(-all_sc, kind="stable", axis=1)[:, :k_scan]
        return (np.take_along_axis(all_sc, order, axis=1),
                np.take_along_axis(all_hr, order, axis=1))

    def _wants_2d(self, want_ns: int, want_canon: int):
        """Cached (1, 2)-shaped device filter pair — the shape the append
        scan and the fused/XLA paths take (sharded kernels use a flat (2,),
        cached under a prefixed key)."""
        wants = self._wants_cache.get((want_ns, want_canon))
        if wants is None:
            wants = jnp.array([[want_ns, want_canon]], jnp.int32)
            self._wants_cache[(want_ns, want_canon)] = wants
        return wants

    @staticmethod
    def _device_to_host_rows(sc: np.ndarray, idx: np.ndarray,
                             rows_map: np.ndarray, n: int) -> np.ndarray:
        if n == 0 or len(rows_map) == 0:  # base snapshot empty (append-only)
            return np.full(idx.shape, -1, np.int64)
        valid = (idx >= 0) & (idx < n) & np.isfinite(sc)
        safe = np.clip(idx, 0, max(n - 1, 0))
        return np.where(valid, rows_map[safe], -1)

    def _refine_exact(self, queries: np.ndarray, sc: np.ndarray,
                      hrows: np.ndarray, k: int,
                      snap: dict | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Re-score the (few) scanned candidates with the exact f32 master
        copy and keep the top k (int8 two-stage refine).  Rows resolve
        through the snapshot's arena generation: a concurrent vacuum swaps
        in renumbered stores, but this snapshot's row numbers belong to the
        stores it was built from."""
        arena = (snap or {}).get("arena_ref", self._arena)
        vecs = arena.view
        out_sc = np.full((sc.shape[0], k), -np.inf, np.float32)
        out_hr = np.full((sc.shape[0], k), -1, np.int64)
        for qi in range(sc.shape[0]):
            cand = hrows[qi][(hrows[qi] >= 0) & np.isfinite(sc[qi])]
            if len(cand) == 0:
                continue
            exact = vecs[cand] @ queries[qi]
            order = np.argsort(-exact, kind="stable")[:k]
            out_sc[qi, : len(order)] = exact[order]
            out_hr[qi, : len(order)] = cand[order]
        return out_sc, out_hr

    def _to_result(self, sc: np.ndarray, hrows: np.ndarray,
                   snap: dict | None = None) -> SearchResult:
        # collect all valid hit rows first and fetch them in ONE batch from
        # the row store (a single SQL query per ~512 rows on disk backing);
        # resolve through the snapshot's row-store generation (see
        # _refine_exact on why — vacuum renumbers)
        rowmeta = (snap or {}).get("rowmeta_ref", self._rowmeta)
        valid: list[tuple[int, int, float]] = []
        for qi in range(sc.shape[0]):
            for j in range(sc.shape[1]):
                host_row = int(hrows[qi, j])
                s = float(sc[qi, j])
                if host_row >= 0 and np.isfinite(s):
                    valid.append((qi, host_row, s))
        fetched = rowmeta.rows([v[1] for v in valid])
        res = SearchResult(ids=[], similarities=[], distances=[], rows=[], metadatas=[], documents=[])
        for qi in range(sc.shape[0]):
            res.ids.append([])
            res.similarities.append([])
            res.distances.append([])
            res.rows.append([])
            res.metadatas.append([])
            res.documents.append([])
        for (qi, host_row, s), (rid, doc, meta) in zip(valid, fetched):
            res.ids[qi].append(rid)
            res.similarities[qi].append(s)
            res.distances[qi].append(1.0 - s)
            res.rows[qi].append(host_row)
            res.metadatas[qi].append(meta)
            res.documents[qi].append(doc)
        return res

    # ------------------------------------------------------------- state (for persistence)

    def state(self, *, include_vectors: bool = True) -> dict[str, Any]:
        with self._lock:
            return self._state_locked(include_vectors=include_vectors)

    def _state_locked(self, include_vectors: bool = True) -> dict[str, Any]:
        live = np.flatnonzero(self._alive)
        rows = self._rowmeta.rows(live.tolist())  # one batch fetch
        st = {
            "kind": self.kind,
            "dim": self.dim,
            "dtype": self._dtype_cfg,  # "auto" stays unresolved in state
            "metric": self.metric,
            "ids": [t[0] for t in rows],
            "metadatas": [t[2] for t in rows],
            "documents": [t[1] for t in rows],
        }
        if include_vectors:
            st["vectors"] = self._vectors[live]
        return st

    def iter_live_rows(self, batch: int = 4096):
        """Yield (id, doc, meta) for live rows in row order, RAM bounded by
        one batch — the streaming save path (store.save_index) for
        disk-backed masters.  Call with the index lock held."""
        for row, rid, doc, meta in self._rowmeta.iter_rows(batch=batch):
            if self._alive[row]:
                yield rid, doc, meta

    @classmethod
    def from_state(cls, state: dict[str, Any], **kw) -> "FlatIndex":
        idx = cls(state["dim"], dtype=state.get("dtype", "bfloat16"),
                  metric=state.get("metric", "cosine"), **kw)
        if len(state["ids"]):
            if isinstance(state["vectors"], np.memmap):
                # saved stores are opened as read-only memmaps: adopt the
                # rows zero-copy (the vector file is not read until rows are
                # touched); the first mutation migrates to a writable backing
                idx._bulk_adopt(state)
            else:
                # vectors are already normalized; bypass re-normalization by direct add
                idx.add(state["ids"], state["vectors"], state["documents"], state["metadatas"])
        return idx

    def _bulk_adopt(self, state: dict[str, Any]) -> None:
        """Populate a fresh index from a saved state without copying the
        vector rows (load path for disk-backed / beyond-RAM masters).  Rows
        are unique and already normalized — save_index writes live rows only."""
        self._bulk_adopt_rows(
            state["vectors"], state["ids"],
            zip(state["documents"], state["metadatas"]),
            count=len(state["ids"]))

    def _bulk_adopt_rows(self, vectors, ids, doc_meta_iter, *, count: int,
                         batch: int = 8192) -> None:
        """Streaming bulk load: `doc_meta_iter` yields (doc, meta) per row —
        rows flow straight into the row store in batches, so a disk-backed
        load never materializes the full doc/meta lists in RAM."""
        with self._lock:
            if len(self._rowmeta):
                raise RuntimeError("bulk adopt requires an empty index")
            self._arena.adopt(vectors)
            ns = np.empty(count, np.int32)
            canon = np.empty(count, np.int32)
            b_ids: list[str] = []
            b_docs: list[str] = []
            b_metas: list[dict] = []
            row = 0

            def _flush():
                start = len(self._rowmeta)
                self._rowmeta.extend_rows(b_ids, b_docs, b_metas)
                self._id_to_row.set_many(
                    (i, start + off) for off, i in enumerate(b_ids))
                b_ids.clear(); b_docs.clear(); b_metas.clear()

            for rid, (doc, meta) in zip(ids, doc_meta_iter):
                meta = dict(meta or {})
                ns[row] = self.ns_vocab.intern(str(meta.get("namespace", "")))
                canon[row] = self.canon_vocab.intern(
                    str(meta.get("canonicality", "")))
                b_ids.append(rid); b_docs.append(doc or ""); b_metas.append(meta)
                row += 1
                if len(b_ids) >= batch:
                    _flush()
            _flush()
            if row != count:
                raise ValueError(f"bulk adopt: expected {count} rows, got {row}")
            self._replace_tag_rows(ns, canon, np.ones(count, bool))
            self._dirty = True

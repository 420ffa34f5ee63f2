"""Host-arena IVF: the beyond-HBM scale tier.

Replaces the reference's hnswlib for corpora that do NOT fit device memory
(reference api/app.py:86-91 holds the whole HNSW graph + vectors in host
RAM; BASELINE #5 is the 100M-row tier).  A v5e chip has 16 GB HBM — a 100M
x 384 int8 corpus is 38.4 GB, so the exhaustive fused scan (ops/topk.py),
which beats device-resident IVF everywhere it fits (docs/IVF.md round-5
measurement), is physically impossible.  This tier keeps:

  - int8 inverted lists + scales/tags/row-ids in HOST RAM (numpy, cap-padded
    per list so a probe gather is a contiguous memcpy per list)
  - the k-means centroids RESIDENT ON DEVICE (nlist x d f32 — a few MB)
  - a small exact-overflow partition (cap-spilled rows) resident on device,
    so spilled rows are never dropped from results (the round-4 sweep's
    recall accounting gap)

Search is a three-hop pipeline engineered around transfer bytes, the tier's
physical bottleneck (PCIe on a real TPU VM, the tunnel here):

  1. queries -> device; centroid top-nprobe on the MXU; probed list ids back
     (Q*nprobe int32 — tiny)
  2. host: dedupe the UNION of probed lists across the query batch and
     gather their blocks (each list is one contiguous (cap, 384) memcpy);
     every list crosses the bus ONCE per batch regardless of how many
     queries probe it
  3. gathered block -> device; one fused_matmul_topk scan (int8 MXU matmul,
     in-kernel filters/top-k — the same kernel the flat index serves with)
     + the device-resident overflow scan; merge on host

The gathered upload is padded to LIST_GRANULE lists so jax.jit sees a small
set of static shapes (compile count is bounded, padding is PAD_TAG-masked
in-kernel).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from tpu_rag.ops.kmeans import assign_clusters, kmeans
from tpu_rag.ops.quant import quantize_int8_rows
from tpu_rag.ops.topk import PAD_TAG, fused_matmul_topk

LIST_GRANULE = 256  # gathered-upload padding granule (bounds jit variants)


class HostArenaIVF:
    """IVF index with host-RAM int8 lists and device-side probe + scan.

    Lifecycle: train(sample) -> add(chunk) x N -> search(...).  add() accepts
    f32/bf16 chunks (device arrays or numpy); vectors are quantized and
    assigned on device, then scattered into the host lists — the f32 corpus
    never exists in full anywhere.
    """

    def __init__(self, dim: int, *, nlist: int = 4096, nprobe: int = 32,
                 cap: int = 0, cap_factor: float = 2.0,
                 expected_rows: int = 0, seed: int = 0,
                 max_overflow: int = 1 << 20) -> None:
        self.dim = dim
        self.nlist = nlist
        self.nprobe = nprobe
        self.seed = seed
        self.cap_factor = cap_factor
        self.expected_rows = expected_rows
        self._cap = cap  # 0 = derive from expected_rows at train()
        self.max_overflow = max_overflow
        self.centroids: Any = None            # device (nlist, d) f32
        self._vec: np.ndarray | None = None   # (nlist, cap, d) int8
        self._scale: np.ndarray | None = None  # (nlist, cap) f32
        self._ns: np.ndarray | None = None    # (nlist, cap) int32
        self._canon: np.ndarray | None = None
        self._row: np.ndarray | None = None   # (nlist, cap) int32 global row
        self._fill: np.ndarray | None = None  # (nlist,) int64
        # device-resident exact overflow (cap-spilled rows)
        self._ov_vec: list[np.ndarray] = []
        self._ov_scale: list[np.ndarray] = []
        self._ov_ns: list[np.ndarray] = []
        self._ov_canon: list[np.ndarray] = []
        self._ov_row: list[np.ndarray] = []
        self._ov_dev: dict[str, Any] | None = None
        self.n_rows = 0
        self.spilled_rows = 0
        self._probe_fns: dict[int, Any] = {}  # jitted centroid top-k per nprobe
        self._interpret = jax.default_backend() != "tpu"

    # ------------------------------------------------------------- build

    @property
    def cap(self) -> int:
        return self._cap

    def train(self, sample) -> None:
        """Spherical k-means on a device-sized sample (f32)."""
        sample = jnp.asarray(sample, jnp.float32)
        cents, _ = kmeans(sample, self.nlist, iters=10, seed=self.seed)
        self.centroids = jnp.asarray(cents)
        if self._cap <= 0:
            mean = max(1.0, (self.expected_rows or sample.shape[0] * 40)
                       / self.nlist)
            self._cap = int(-(-int(self.cap_factor * mean) // 128) * 128)
        self._alloc()

    def _alloc(self) -> None:
        nl, cap, d = self.nlist, self._cap, self.dim
        self._vec = np.zeros((nl, cap, d), np.int8)
        self._scale = np.zeros((nl, cap), np.float32)
        self._ns = np.full((nl, cap), PAD_TAG, np.int32)
        self._canon = np.full((nl, cap), PAD_TAG, np.int32)
        self._row = np.full((nl, cap), -1, np.int32)
        self._fill = np.zeros((nl,), np.int64)

    def add(self, vectors, ns=None, canon=None) -> None:
        """Add a chunk: quantize + assign on device, scatter into host lists.
        vectors: (m, d) f32/bf16, numpy or device array (L2-normalized by the
        caller / encoder).  Transfers: chunk up (if numpy), int8 + assign
        down — O(chunk)."""
        if self.centroids is None:
            raise RuntimeError("train() before add()")
        xd = jnp.asarray(vectors, jnp.float32)
        m = int(xd.shape[0])
        if m == 0:
            return
        v8, s8 = quantize_int8_rows(xd)
        a = assign_clusters(xd, self.centroids)
        v8_np = np.asarray(v8)
        s8_np = np.asarray(s8)
        a_np = np.asarray(a).astype(np.int64)
        ns_np = (np.zeros(m, np.int32) if ns is None
                 else np.asarray(ns, np.int32))
        canon_np = (np.zeros(m, np.int32) if canon is None
                    else np.asarray(canon, np.int32))
        rows = np.arange(self.n_rows, self.n_rows + m, dtype=np.int32)

        # rank each row within its target list; past-cap rows spill
        order = np.argsort(a_np, kind="stable")
        sa = a_np[order]
        within = np.arange(m) - np.searchsorted(sa, sa)
        slot = self._fill[sa] + within
        ok = slot < self._cap
        sel = order[ok]
        l_idx = sa[ok]
        s_idx = slot[ok]
        self._vec[l_idx, s_idx] = v8_np[sel]
        self._scale[l_idx, s_idx] = s8_np[sel]
        self._ns[l_idx, s_idx] = ns_np[sel]
        self._canon[l_idx, s_idx] = canon_np[sel]
        self._row[l_idx, s_idx] = rows[sel]
        np.add.at(self._fill, a_np, 1)
        self._fill = np.minimum(self._fill, self._cap)

        spill = order[~ok]
        if len(spill):
            if self.spilled_rows + len(spill) > self.max_overflow:
                raise RuntimeError(
                    f"overflow partition would exceed max_overflow="
                    f"{self.max_overflow}; raise cap_factor or nlist")
            self._ov_vec.append(v8_np[spill])
            self._ov_scale.append(s8_np[spill])
            self._ov_ns.append(ns_np[spill])
            self._ov_canon.append(canon_np[spill])
            self._ov_row.append(rows[spill])
            self.spilled_rows += len(spill)
            self._ov_dev = None  # rebuild lazily
        self.n_rows += m

    def _overflow_device(self) -> dict[str, Any] | None:
        if not self.spilled_rows:
            return None
        if self._ov_dev is None:
            v = np.concatenate(self._ov_vec, axis=0)
            n = len(v)
            n_pad = -(-n // 128) * 128
            pad = n_pad - n

            def p2(x, fill):
                return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                              constant_values=fill)

            self._ov_dev = {
                "vec": jnp.asarray(p2(v, 0)),
                "scale": jnp.asarray(p2(np.concatenate(self._ov_scale), 0.0)),
                "ns": jnp.asarray(p2(np.concatenate(self._ov_ns), PAD_TAG)),
                "canon": jnp.asarray(
                    p2(np.concatenate(self._ov_canon), PAD_TAG)),
                "row": np.concatenate(self._ov_row),
            }
        return self._ov_dev

    # ------------------------------------------------------------- search

    def _probe(self, qd, nprobe: int):
        fn = self._probe_fns.get(nprobe)
        if fn is None:
            @jax.jit
            def fn(q, c):
                sims = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
                return jax.lax.top_k(sims, nprobe)[1]
            self._probe_fns[nprobe] = fn
        return fn(qd, self.centroids)

    def search(self, queries, k: int, *, nprobe: int = 0,
               want_ns: int = -1, want_canon: int = -1,
               mode: str = "exact"):
        """Returns (scores (Q, k) f32, rows (Q, k) int64; -1 = no hit).
        Scores are int8-quantized inner products (the tier has no f32
        master to refine against — by design, it would not fit anywhere).

        mode defaults to "exact" (per-tile k-pass selection): the gathered
        union is small relative to the corpus and the tier is transfer-
        bound, so the VPU epilogue is free — while "bucketed"'s one-winner-
        per-128-lane reduction loses real recall here because IVF gathers
        are exactly where true neighbors pack densely (measured 0.15 vs
        0.93 recall@10 on the clustered CPU test corpus)."""
        if self._vec is None:
            raise RuntimeError("index is empty (train/add first)")
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        nprobe = min(nprobe or self.nprobe, self.nlist)
        qd = jnp.asarray(q)
        lists = np.asarray(self._probe(qd, nprobe))          # (Q, nprobe)

        uniq = np.unique(lists.reshape(-1))
        u = len(uniq)
        u_pad = -(-u // LIST_GRANULE) * LIST_GRANULE
        cap, d = self._cap, self.dim
        # gather: one contiguous (cap, d) memcpy per unique list
        gv = np.empty((u_pad, cap, d), np.int8)
        gs = np.zeros((u_pad, cap), np.float32)
        gns = np.full((u_pad, cap), PAD_TAG, np.int32)
        gcanon = np.full((u_pad, cap), PAD_TAG, np.int32)
        np.take(self._vec, uniq, axis=0, out=gv[:u])
        np.take(self._scale, uniq, axis=0, out=gs[:u])
        np.take(self._ns, uniq, axis=0, out=gns[:u])
        np.take(self._canon, uniq, axis=0, out=gcanon[:u])
        grow = self._row[uniq].reshape(-1)                   # host-side map

        sc_g, id_g = fused_matmul_topk(
            qd, jnp.asarray(gv.reshape(u_pad * cap, d)), k,
            db_scales=jnp.asarray(gs.reshape(-1)),
            ns_tags=jnp.asarray(gns.reshape(-1)),
            canon_tags=jnp.asarray(gcanon.reshape(-1)),
            want_ns=want_ns, want_canon=want_canon,
            interpret=self._interpret, mode=mode)
        sc_g, id_g = np.asarray(sc_g), np.asarray(id_g)
        safe = np.clip(id_g, 0, u * cap - 1)
        rows_g = np.where(id_g >= 0, grow[safe.reshape(-1)].reshape(id_g.shape),
                          -1).astype(np.int64)

        ov = self._overflow_device()
        if ov is not None:
            sc_o, id_o = fused_matmul_topk(
                qd, ov["vec"], min(k, ov["vec"].shape[0]),
                db_scales=ov["scale"], ns_tags=ov["ns"],
                canon_tags=ov["canon"], want_ns=want_ns,
                want_canon=want_canon, interpret=self._interpret,
                mode="exact")
            sc_o, id_o = np.asarray(sc_o), np.asarray(id_o)
            safe_o = np.clip(id_o, 0, len(ov["row"]) - 1)
            rows_o = np.where(id_o >= 0, ov["row"][safe_o.reshape(-1)]
                              .reshape(id_o.shape), -1).astype(np.int64)
            sc_g = np.concatenate([sc_g, sc_o], axis=1)
            rows_g = np.concatenate([rows_g, rows_o], axis=1)

        ordm = np.argsort(-sc_g, axis=1, kind="stable")[:, :k]
        sc = np.take_along_axis(sc_g, ordm, axis=1)
        rows = np.take_along_axis(rows_g, ordm, axis=1)
        rows = np.where(np.isfinite(sc), rows, -1)
        return sc, rows

    # ------------------------------------------------------------- persist

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        meta = {"dim": self.dim, "nlist": self.nlist, "nprobe": self.nprobe,
                "cap": self._cap, "n_rows": self.n_rows,
                "spilled_rows": self.spilled_rows, "seed": self.seed,
                "version": 1}
        for name, arr in (("vec", self._vec), ("scale", self._scale),
                          ("ns", self._ns), ("canon", self._canon),
                          ("row", self._row)):
            np.save(os.path.join(path, f"lists_{name}.npy"), arr)
        np.save(os.path.join(path, "fill.npy"), self._fill)
        np.save(os.path.join(path, "centroids.npy"),
                np.asarray(self.centroids))
        if self.spilled_rows:
            np.savez(os.path.join(path, "overflow.npz"),
                     vec=np.concatenate(self._ov_vec),
                     scale=np.concatenate(self._ov_scale),
                     ns=np.concatenate(self._ov_ns),
                     canon=np.concatenate(self._ov_canon),
                     row=np.concatenate(self._ov_row))
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "meta.json"))

    @classmethod
    def load(cls, path: str, *, mmap: bool = True) -> "HostArenaIVF":
        """mmap=True maps the list arrays from disk (lazy page-in): the tier
        can serve corpora larger than host RAM at reduced QPS."""
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        ix = cls(meta["dim"], nlist=meta["nlist"], nprobe=meta["nprobe"],
                 cap=meta["cap"], seed=meta.get("seed", 0))
        mm = "r" if mmap else None
        ix._vec = np.load(os.path.join(path, "lists_vec.npy"), mmap_mode=mm)
        ix._scale = np.load(os.path.join(path, "lists_scale.npy"), mmap_mode=mm)
        ix._ns = np.load(os.path.join(path, "lists_ns.npy"), mmap_mode=mm)
        ix._canon = np.load(os.path.join(path, "lists_canon.npy"), mmap_mode=mm)
        ix._row = np.load(os.path.join(path, "lists_row.npy"), mmap_mode=mm)
        ix._fill = np.load(os.path.join(path, "fill.npy"))
        ix.centroids = jnp.asarray(np.load(os.path.join(path, "centroids.npy")))
        ov_path = os.path.join(path, "overflow.npz")
        if os.path.exists(ov_path):
            z = np.load(ov_path)
            ix._ov_vec = [z["vec"]]
            ix._ov_scale = [z["scale"]]
            ix._ov_ns = [z["ns"]]
            ix._ov_canon = [z["canon"]]
            ix._ov_row = [z["row"]]
            ix.spilled_rows = len(z["row"])
        ix.n_rows = meta["n_rows"]
        return ix

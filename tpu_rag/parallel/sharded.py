"""Index/shard parallelism: corpus sharded over a device mesh.

SURVEY.md §2.5 calls this the parallelism strategy that matters for this
workload (the reference's hnswlib is single-machine).  The corpus is
row-sharded over the mesh's "data" axis in contiguous blocks; each device
runs the fused matmul+top-k kernel on its shard, then an all_gather over ICI
merges the per-shard top-k into the exact global top-k (the union of
per-shard exact top-k's contains the global top-k).

Determinism: shards are contiguous id ranges and lax.top_k breaks ties by
lowest candidate position, so score ties resolve to the smallest global row
id regardless of device count.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_rag.index.flat import FlatIndex, SearchResult, _normalize
from tpu_rag.ops.quant import quantize_int8_rows
from tpu_rag.ops.topk import PAD_TAG, fused_matmul_topk, topk_xla_reference


def make_sharded_search(mesh: Mesh, *, k: int, use_pallas: bool, axis: str = "data",
                        mode: str = "exact"):
    """Build a jitted sharded search fn for a fixed mesh/k.

    Returned fn: (q (Q,d) f32 replicated, x (N,d) row-sharded, scales (N,) or
    ones, ns (N,), canon (N,), wants (2,) i32) -> (scores (Q,k), global ids (Q,k)).
    N must be divisible by mesh axis size (pad with PAD_TAG rows).
    """

    def local(q, x, scales, ns, canon, wants):
        rows_per_shard = x.shape[0]  # per-shard block inside shard_map
        if use_pallas:
            sc, idx = fused_matmul_topk(
                q, x, k, db_scales=scales, ns_tags=ns, canon_tags=canon,
                want_ns=wants[0], want_canon=wants[1], mode=mode,
            )
        else:
            sc, idx = topk_xla_reference(
                q, x, k, db_scales=scales, ns_tags=ns, canon_tags=canon,
                want_ns=wants[0], want_canon=wants[1],
            )
        shard = jax.lax.axis_index(axis)
        gid = jnp.where(idx >= 0, idx + shard * rows_per_shard, -1)
        sc_all = jax.lax.all_gather(sc, axis)    # (D, Q, k) — rides ICI
        id_all = jax.lax.all_gather(gid, axis)
        d_ax = sc_all.shape[0]
        qn = q.shape[0]
        sc_flat = jnp.moveaxis(sc_all, 0, 1).reshape(qn, d_ax * k)
        id_flat = jnp.moveaxis(id_all, 0, 1).reshape(qn, d_ax * k)
        top_sc, pos = jax.lax.top_k(sc_flat, k)
        top_id = jnp.take_along_axis(id_flat, pos, axis=1)
        return top_sc, top_id

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn)


class ShardedFlatIndex(FlatIndex):
    """FlatIndex whose device snapshot is row-sharded over a mesh axis."""

    kind = "sharded_flat"

    def __init__(self, dim: int, *, mesh: Mesh | None = None, axis: str = "data", **kw) -> None:
        super().__init__(dim, **kw)
        self.mesh = mesh
        self.axis = axis
        self._search_fns: dict[int, Any] = {}
        # incremental append blocks are a single-device mechanism; sharded
        # snapshots re-distribute on mutation (per-shard append blocks land
        # with ShardedIVFIndex-style reshard support)
        self.incremental = False

    def _mesh(self) -> Mesh:
        if self.mesh is None:
            from tpu_rag.parallel.mesh import mesh_from_spec
            self.mesh = mesh_from_spec("")
        return self.mesh

    def _compact(self) -> dict[str, Any]:
        mesh = self._mesh()
        d_ax = mesh.shape[self.axis]
        live = np.flatnonzero(self._alive)
        n = len(live)
        # pad to a multiple of (devices * 256) so every shard tiles cleanly
        unit = d_ax * 256
        n_pad = max(unit, -(-n // unit) * unit)
        vecs = np.zeros((n_pad, self.dim), np.float32)
        vecs[:n] = self._vectors[live]
        ns = np.full((n_pad,), PAD_TAG, np.int32)
        canon = np.full((n_pad,), PAD_TAG, np.int32)
        ns[:n] = self._ns[live]
        canon[:n] = self._canon[live]

        sharding = NamedSharding(mesh, P(self.axis))
        snap: dict[str, Any] = {"rows": live, "n": n, "n_pad": n_pad}
        if self.dtype == "int8":
            vals, scales = quantize_int8_rows(jnp.asarray(vecs))
            snap["vectors"] = jax.device_put(vals, NamedSharding(mesh, P(self.axis, None)))
            snap["scales"] = jax.device_put(scales, sharding)
        else:
            jdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            snap["vectors"] = jax.device_put(jnp.asarray(vecs, dtype=jdt),
                                             NamedSharding(mesh, P(self.axis, None)))
            snap["scales"] = jax.device_put(jnp.ones((n_pad,), jnp.float32), sharding)
        snap["ns"] = jax.device_put(jnp.asarray(ns), sharding)
        snap["canon"] = jax.device_put(jnp.asarray(canon), sharding)
        return snap

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
            return SearchResult(ids=[[] for _ in range(nq)], similarities=[[] for _ in range(nq)],
                                distances=[[] for _ in range(nq)], rows=[[] for _ in range(nq)],
                                metadatas=[[] for _ in range(nq)], documents=[[] for _ in range(nq)])

        snap = self.device_snapshot()
        # int8 two-stage refine (same as FlatIndex): oversample on the scan,
        # re-score the handful exactly on host
        k_scan = k
        if self.dtype == "int8" and self.refine_factor > 0:
            k_scan = min(max(k * self.refine_factor, k), max(snap["n"], 1))
        fn = self._search_fns.get(k_scan)
        if fn is None:
            fn = make_sharded_search(self._mesh(), k=k_scan, use_pallas=self.use_pallas,
                                     axis=self.axis, mode=self.search_mode)
            self._search_fns[k_scan] = fn
        # cache the filter pair on device — a fresh host->device transfer per
        # search costs a full RTT on tunneled backends (same as FlatIndex)
        wants = self._wants_cache.get(("sharded", want_ns, want_canon))
        if wants is None:
            wants = jnp.array([want_ns, want_canon], jnp.int32)
            self._wants_cache[("sharded", want_ns, want_canon)] = wants
        sc, gid = fn(jnp.asarray(queries), snap["vectors"], snap["scales"],
                     snap["ns"], snap["canon"], wants)
        sc, gid = np.asarray(sc), np.asarray(gid)
        # padding rows sit at the end of the padded array, so a global padded
        # index < n equals the live-row position directly
        hrows = self._device_to_host_rows(sc, gid, snap["rows"], snap["n"])
        if k_scan > k:
            sc, hrows = self._refine_exact(queries, sc, hrows, k)
        return self._to_result(sc, hrows)

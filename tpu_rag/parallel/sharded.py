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

from tpu_rag.index.flat import (FlatIndex, SearchResult, _normalize,
                                _quantize_int8_np, refine_k_scan)
from tpu_rag.index.ivf import IVFIndex, _probe_impl
from tpu_rag.ops.kmeans import kmeans
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
        k_scan = refine_k_scan(self.dtype, self.refine_factor, k, snap["n"])
        # "auto" resolves per SHARD size: the corpus is sharded only over
        # self.axis, so per-shard rows = n / mesh.shape[axis] (NOT the total
        # device count — a data x model mesh shards rows over "data" only)
        mode = self.effective_search_mode(
            snap["n"] // max(1, self._mesh().shape[self.axis]))
        fn = self._search_fns.get((k_scan, mode))
        if fn is None:
            fn = make_sharded_search(self._mesh(), k=k_scan, use_pallas=self.use_pallas,
                                     axis=self.axis, mode=mode)
            self._search_fns[(k_scan, mode)] = fn
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


def make_sharded_ivf_search(mesh: Mesh, *, k: int, nprobe: int, axis: str = "data",
                            use_pallas: bool = False, interpret: bool = False,
                            have_ov: bool = False):
    """Jitted SPMD IVF search: every device probes ITS OWN inverted lists
    (same replicated centroids, shard-local list contents) plus its exact
    overflow block, then an all_gather over ICI merges per-shard top-k into
    the global top-k.  row_lists carry global host rows, so no id offset
    arithmetic crosses shards (BASELINE config #5: int8 IVF shards)."""

    def local(q, centroids, vl, sl, nl, cl, rl, ov_v, ov_s, ov_n, ov_c, ov_r, wants):
        # shard_map passes per-shard blocks with the leading shard axis
        # dropped for rank>1 inputs sharded on axis 0 of size D -> here each
        # array keeps a leading 1 (block) dim; squeeze it.
        vl, sl, nl, cl, rl = vl[0], sl[0], nl[0], cl[0], rl[0]
        parts_sc, parts_rows = [], []
        cap = vl.shape[1]
        k_main = min(k, nprobe * cap)
        if use_pallas:
            from tpu_rag.ops.ivf_probe import ivf_probe_pallas
            sc1, rows1 = ivf_probe_pallas(
                q, centroids, vl, sl, nl, cl, rl, wants,
                nprobe=nprobe, k=k_main, interpret=interpret)
        else:
            sc1, rows1 = _probe_impl(
                q, centroids, vl, sl, nl, cl, rl, wants, nprobe=nprobe, k=k_main)
        parts_sc.append(sc1)
        parts_rows.append(rows1)
        if have_ov:
            ov_v, ov_s, ov_n, ov_c, ov_r = ov_v[0], ov_s[0], ov_n[0], ov_c[0], ov_r[0]
            k_ov = min(k, ov_v.shape[0])
            sc2, idx2 = topk_xla_reference(
                q, ov_v, k_ov, db_scales=ov_s, ns_tags=ov_n, canon_tags=ov_c,
                want_ns=wants[0], want_canon=wants[1])
            rows2 = jnp.where(idx2 >= 0, ov_r[jnp.clip(idx2, 0, None)], -1)
            parts_sc.append(sc2)
            parts_rows.append(rows2)
        local_sc = jnp.concatenate(parts_sc, axis=1)
        local_rows = jnp.concatenate(parts_rows, axis=1)
        k_local = min(k, local_sc.shape[1])
        top_sc, pos = jax.lax.top_k(local_sc, k_local)
        top_rows = jnp.take_along_axis(local_rows, pos, axis=1)
        sc_all = jax.lax.all_gather(top_sc, axis)    # (D, Q, k_local) over ICI
        row_all = jax.lax.all_gather(top_rows, axis)
        d_ax, qn = sc_all.shape[0], q.shape[0]
        sc_flat = jnp.moveaxis(sc_all, 0, 1).reshape(qn, d_ax * k_local)
        row_flat = jnp.moveaxis(row_all, 0, 1).reshape(qn, d_ax * k_local)
        g_sc, g_pos = jax.lax.top_k(sc_flat, min(k, sc_flat.shape[1]))
        g_rows = jnp.take_along_axis(row_flat, g_pos, axis=1)
        g_rows = jnp.where(jnp.isneginf(g_sc), -1, g_rows)
        return g_sc, g_rows

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn)


class ShardedIVFIndex(IVFIndex):
    """IVF lists sharded over the mesh "data" axis: each device owns the
    inverted lists for its row shard (replicated centroids), probes locally,
    and the global top-k merges over ICI.  int8 list storage + in-kernel
    metadata filters ride along exactly as in the single-device IVFIndex —
    this is BASELINE config #5's index layout (100M int8 IVF shards)."""

    kind = "sharded_ivf"

    def __init__(self, dim: int, *, mesh: Mesh | None = None, axis: str = "data",
                 kmeans_sample: int = 262_144, **kw) -> None:
        super().__init__(dim, **kw)
        self.mesh = mesh
        self.axis = axis
        self.kmeans_sample = kmeans_sample
        # sharded snapshots re-distribute on mutation (incremental per-shard
        # append blocks are future work; flat/IVF single-device have them)
        self.incremental = False
        self._sivf_fns: dict[tuple, Any] = {}

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
        snap: dict[str, Any] = {"rows": live, "n": n, "nlist": 0}
        if n == 0:
            return snap

        # centroids: train on a subsample (device k-means), reuse when valid
        reuse = (self._cached_centroids is not None
                 and self._cached_centroids.shape[1] == self.dim
                 and n <= 2 * max(1, self._centroids_trained_n))
        xs = self._vectors[live]
        if not reuse:
            rng = np.random.default_rng(self.seed)
            sub = xs if n <= self.kmeans_sample else xs[
                rng.choice(n, self.kmeans_sample, replace=False)]
            nlist = self._auto_nlist(n)
            centroids, _ = kmeans(jnp.asarray(sub), nlist,
                                  iters=self.kmeans_iters, seed=self.seed)
            self._cached_centroids = np.asarray(centroids)
            self._centroids_trained_n = n
        centroids = np.asarray(self._cached_centroids, np.float32)
        nlist = centroids.shape[0]

        # assign every row to its nearest centroid (host, chunked matmul)
        assign = np.empty(n, np.int32)
        for i in range(0, n, 65536):
            assign[i:i + 65536] = np.argmax(xs[i:i + 65536] @ centroids.T, axis=1)

        # contiguous row shards; uniform (cap, ov_cap) across shards (SPMD)
        bounds = np.linspace(0, n, d_ax + 1).astype(np.int64)
        shard_slices = [slice(bounds[i], bounds[i + 1]) for i in range(d_ax)]
        per_shard_n = max(int(bounds[1:].max(initial=0) - 0), 1)
        mean_count = max(1.0, (n / d_ax) / nlist)
        cap = int(max(8, self.list_cap_factor * mean_count))
        cap = max(8, -(-cap // 8) * 8)

        vec = np.zeros((d_ax, nlist, cap, self.dim), np.float32)
        ns_l = np.full((d_ax, nlist, cap), PAD_TAG, np.int32)
        canon_l = np.full((d_ax, nlist, cap), PAD_TAG, np.int32)
        rows_l = np.full((d_ax, nlist, cap), -1, np.int32)
        spills = []
        for s, sl in enumerate(shard_slices):
            a = assign[sl]
            order = np.argsort(a, kind="stable")
            sorted_a = a[order]
            starts = np.searchsorted(sorted_a, np.arange(nlist))
            slots = np.arange(len(a)) - starts[sorted_a]
            fits = slots < cap
            li, si = sorted_a[fits], slots[fits]
            local_rows = live[sl][order]
            vec[s, li, si] = xs[sl][order][fits]
            ns_l[s, li, si] = self._ns[local_rows[fits]]
            canon_l[s, li, si] = self._canon[local_rows[fits]]
            rows_l[s, li, si] = local_rows[fits]
            spills.append(local_rows[~fits])

        ov_cap = max(8, -(-max((len(sp) for sp in spills), default=0) // 8) * 8)
        ov_v = np.zeros((d_ax, ov_cap, self.dim), np.float32)
        ov_s = np.ones((d_ax, ov_cap), np.float32)
        ov_n = np.full((d_ax, ov_cap), PAD_TAG, np.int32)
        ov_c = np.full((d_ax, ov_cap), PAD_TAG, np.int32)
        ov_r = np.full((d_ax, ov_cap), -1, np.int32)
        have_ov = any(len(sp) for sp in spills)
        for s, sp in enumerate(spills):
            if not len(sp):
                continue
            ov_v[s, :len(sp)] = self._vectors[sp]
            ov_n[s, :len(sp)] = self._ns[sp]
            ov_c[s, :len(sp)] = self._canon[sp]
            ov_r[s, :len(sp)] = sp

        shard4 = NamedSharding(mesh, P(self.axis, None, None, None))
        shard3 = NamedSharding(mesh, P(self.axis, None, None))
        shard2 = NamedSharding(mesh, P(self.axis, None))
        if self.dtype == "int8":
            flat = vec.reshape(-1, self.dim)
            vals, scales = _quantize_int8_np(flat)
            scales[~(np.abs(flat).max(axis=1) > 0)] = 0.0
            snap["vec_lists"] = jax.device_put(
                vals.reshape(d_ax, nlist, cap, self.dim), shard4)
            snap["scale_lists"] = jax.device_put(
                scales.reshape(d_ax, nlist, cap).astype(np.float32), shard3)
            ovals, oscales = _quantize_int8_np(ov_v.reshape(-1, self.dim))
            snap["ov_vectors"] = jax.device_put(
                ovals.reshape(d_ax, ov_cap, self.dim), shard3)
            snap["ov_scales"] = jax.device_put(
                oscales.reshape(d_ax, ov_cap).astype(np.float32), shard2)
        else:
            jdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            snap["vec_lists"] = jax.device_put(jnp.asarray(vec, jdt), shard4)
            snap["scale_lists"] = jax.device_put(
                jnp.ones((d_ax, nlist, cap), jnp.float32), shard3)
            snap["ov_vectors"] = jax.device_put(jnp.asarray(ov_v, jdt), shard3)
            snap["ov_scales"] = jax.device_put(jnp.asarray(ov_s), shard2)
        snap["centroids"] = jnp.asarray(centroids)
        snap["ns_lists"] = jax.device_put(jnp.asarray(ns_l), shard3)
        snap["canon_lists"] = jax.device_put(jnp.asarray(canon_l), shard3)
        snap["row_lists"] = jax.device_put(jnp.asarray(rows_l), shard3)
        snap["ov_ns"] = jax.device_put(jnp.asarray(ov_n), shard2)
        snap["ov_canon"] = jax.device_put(jnp.asarray(ov_c), shard2)
        snap["ov_rows"] = jax.device_put(jnp.asarray(ov_r), shard2)
        snap["nlist"] = nlist
        snap["have_ov"] = have_ov
        self._sivf_fns.clear()
        return snap

    def search(self, queries: np.ndarray, k: int, *, namespace: str | None = None,
               canonicality: str | None = None) -> SearchResult:
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if self.metric == "cosine":
            queries = _normalize(queries)
        nq = queries.shape[0]

        want_ns = self.ns_vocab.lookup(namespace)
        want_canon = self.canon_vocab.lookup(canonicality)
        if want_ns == -2 or want_canon == -2 or self.count() == 0:
            return SearchResult(ids=[[] for _ in range(nq)],
                                similarities=[[] for _ in range(nq)],
                                distances=[[] for _ in range(nq)],
                                rows=[[] for _ in range(nq)],
                                metadatas=[[] for _ in range(nq)],
                                documents=[[] for _ in range(nq)])

        snap = self.device_snapshot()
        k_scan = refine_k_scan(self.dtype, self.refine_factor, k, snap["n"])
        nprobe = min(self.nprobe, snap["nlist"])
        interpret = jax.default_backend() != "tpu"
        key = (k_scan, nprobe, snap["have_ov"], snap["nlist"])
        fn = self._sivf_fns.get(key)
        if fn is None:
            fn = make_sharded_ivf_search(
                self._mesh(), k=k_scan, nprobe=nprobe, axis=self.axis,
                use_pallas=self.use_pallas, interpret=interpret,
                have_ov=snap["have_ov"])
            self._sivf_fns[key] = fn
        wants = self._wants_cache.get(("sivf", want_ns, want_canon))
        if wants is None:
            wants = jnp.array([want_ns, want_canon], jnp.int32)
            self._wants_cache[("sivf", want_ns, want_canon)] = wants
        sc, hrows = fn(jnp.asarray(queries), snap["centroids"],
                       snap["vec_lists"], snap["scale_lists"], snap["ns_lists"],
                       snap["canon_lists"], snap["row_lists"],
                       snap["ov_vectors"], snap["ov_scales"], snap["ov_ns"],
                       snap["ov_canon"], snap["ov_rows"], wants)
        sc = np.asarray(sc)
        hrows = np.asarray(hrows).astype(np.int64)
        hrows = np.where(np.isfinite(sc), hrows, -1)
        if k_scan > k:
            sc, hrows = self._refine_exact(queries, sc, hrows, k)
        return self._to_result(sc, hrows)

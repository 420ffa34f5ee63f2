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

import ml_dtypes
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


_KILL_NOOP = 2**31 - 1  # > any real tag id; min-combine makes it a no-op


def _stream_to_mesh(shape, sharding: NamedSharding, cb):
    """Assemble a sharded jax.Array by materializing each device's block on
    host ONE AT A TIME (cb(index) -> np block, freed right after its
    device_put) — peak host memory is a single block, unlike
    jax.make_array_from_callback which gathers every block before placing."""
    arrs = [
        jax.device_put(cb(idx), dev)
        for dev, idx in sharding.addressable_devices_indices_map(shape).items()
    ]
    return jax.make_array_from_single_device_arrays(shape, sharding, arrs)


def make_sharded_kill(mesh: Mesh, axis: str = "data"):
    """Jitted SPMD tag-kill: flip tags to PAD_TAG at *global flat positions*
    on arrays sharded over `axis` on dim 0.  Each device scatters only the
    positions that fall inside its local block, so transfer is O(killed
    rows) and the arrays never leave their shards (a plain jitted scatter on
    a sharded operand would let GSPMD choose a layout and possibly gather).

    Duplicate positions (the caller pads chunks with repeats) are safe: the
    scatter combines with `min`, and PAD_TAG (INT32_MIN) < every tag while
    _KILL_NOOP (INT32_MAX) > every tag.
    """

    def local(ns, canon, idx):
        shape = ns.shape
        nsf, cf = ns.reshape(-1), canon.reshape(-1)
        m = nsf.shape[0]
        li = idx - jax.lax.axis_index(axis) * m
        valid = (li >= 0) & (li < m)
        safe = jnp.clip(li, 0, m - 1)
        upd = jnp.where(valid, jnp.int32(PAD_TAG), jnp.int32(_KILL_NOOP))
        return (nsf.at[safe].min(upd).reshape(shape),
                cf.at[safe].min(upd).reshape(shape))

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False))


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
        # Incremental mutation (parity with hnswlib's in-place insert,
        # reference api/app.py:209-225, at sharded scale): adds stream into
        # the FlatIndex device append block (unsharded — it is <= 4096 rows,
        # scanned exactly and merged on host), deletes flip tags in place on
        # the SHARDED base arrays via make_sharded_kill.  A /docs/save
        # against a sharded corpus therefore transfers O(doc), not O(corpus).
        self.incremental = True
        self._sharded_kill = None

    def _mesh(self) -> Mesh:
        if self.mesh is None:
            from tpu_rag.parallel.mesh import mesh_from_spec
            self.mesh = mesh_from_spec("")
        return self.mesh

    def _compact(self) -> dict[str, Any]:
        """Streamed per-shard build: each device's block is materialized on
        host one shard at a time and released right after its device_put
        (_stream_to_mesh), so host temporaries stay O(n_pad / d_ax) — the
        old build staged the whole padded (n_pad, dim) f32 corpus on host
        (153 GB at 100M x 384), the same host-RAM cliff VERDICT r2 #3
        flagged for the sharded IVF build."""
        mesh = self._mesh()
        d_ax = mesh.shape[self.axis]
        live = np.flatnonzero(self._alive)
        n = len(live)
        # pad to a multiple of (devices * 256) so every shard tiles cleanly
        unit = d_ax * 256
        n_pad = max(unit, -(-n // unit) * unit)
        snap: dict[str, Any] = {"rows": live, "n": n, "n_pad": n_pad}

        src = self._vectors

        def f32_piece(lo: int, hi: int) -> np.ndarray:
            out = np.zeros((hi - lo, self.dim), np.float32)
            m = max(0, min(n, hi) - lo)
            if m > 0:
                out[:m] = src[live[lo:lo + m]]
            return out

        sh1 = NamedSharding(mesh, P(self.axis))
        sh2 = NamedSharding(mesh, P(self.axis, None))
        if self.dtype == "int8":
            # vectors first: one quantize pass per shard feeds both arrays
            # (the scale cache is O(n) floats, not O(n * dim))
            scale_cache: dict[tuple[int, int], np.ndarray] = {}

            def vec_cb(idx):
                lo, hi, _ = idx[0].indices(n_pad)
                q, s = _quantize_int8_np(f32_piece(lo, hi))
                scale_cache[(lo, hi)] = s
                return q

            def scale_cb(idx):
                lo, hi, _ = idx[0].indices(n_pad)
                s = scale_cache.get((lo, hi))
                if s is None:  # shard bounds differ (replicated mesh axes)
                    _, s = _quantize_int8_np(f32_piece(lo, hi))
                return s

            snap["vectors"] = _stream_to_mesh((n_pad, self.dim), sh2, vec_cb)
            snap["scales"] = _stream_to_mesh((n_pad,), sh1, scale_cb)
        else:
            npdt = (ml_dtypes.bfloat16 if self.dtype == "bfloat16"
                    else np.float32)

            def vec_cb(idx):
                lo, hi, _ = idx[0].indices(n_pad)
                return f32_piece(lo, hi).astype(npdt)

            snap["vectors"] = _stream_to_mesh((n_pad, self.dim), sh2, vec_cb)
            snap["scales"] = jax.device_put(jnp.ones((n_pad,), jnp.float32),
                                            sh1)

        def tag_cb(arr):
            def cb(idx):
                lo, hi, _ = idx[0].indices(n_pad)
                out = np.full((hi - lo,), PAD_TAG, np.int32)
                m = max(0, min(n, hi) - lo)
                if m > 0:
                    out[:m] = arr[live[lo:lo + m]]
                return out
            return cb

        snap["ns"] = _stream_to_mesh((n_pad,), sh1, tag_cb(self._ns))
        snap["canon"] = _stream_to_mesh((n_pad,), sh1, tag_cb(self._canon))
        if self.incremental:
            self._alloc_append_block(snap)
        return snap

    def _kill_tags_target(self, snap: dict[str, Any], target: str, chunk):
        """Base-snapshot kills scatter shard-locally (the base tag arrays are
        sharded); append-block kills use the inherited unsharded path."""
        if target:
            return super()._kill_tags_target(snap, target, chunk)
        if self._sharded_kill is None:
            self._sharded_kill = make_sharded_kill(self._mesh(), self.axis)
        return self._sharded_kill(snap["ns"], snap["canon"], chunk)

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
        # "auto" resolves per SHARD size: the corpus is sharded only over
        # self.axis, so per-shard rows = n / mesh.shape[axis] (NOT the total
        # device count — a data x model mesh shards rows over "data" only)
        mode = self.effective_search_mode(
            snap["n"] // max(1, self._mesh().shape[self.axis]))
        # re-score the handful exactly on host
        k_scan = refine_k_scan(snap.get("dtype", self.dtype),
                               self.refine_factor, k, snap["n"], mode=mode)
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
        # mode "packed" only ever arrives here by explicit opt-in (auto
        # resolves exact/bucketed), so kernel failures surface unwrapped
        sc, gid = fn(jnp.asarray(queries), snap["vectors"], snap["scales"],
                     snap["ns"], snap["canon"], wants)
        sc, gid = np.asarray(sc), np.asarray(gid)
        # padding rows sit at the end of the padded array, so a global padded
        # index < n equals the live-row position directly
        hrows = self._device_to_host_rows(sc, gid, snap["rows"], snap["n"])
        if snap.get("a_fill", 0) > 0:
            sc, hrows = self._merge_append_block(
                jnp.asarray(queries), sc, hrows, snap, k_scan,
                self._wants_2d(want_ns, want_canon))
        if k_scan > k:
            sc, hrows = self._refine_exact(queries, sc, hrows, k, snap=snap)
        return self._to_result(sc, hrows, snap=snap)


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
        from tpu_rag.ops.ivf_probe import _K_EFF_MAX
        if use_pallas and min(k_main, cap) <= _K_EFF_MAX:
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
                 kmeans_sample: int = 262_144, assign_chunk: int = 65_536,
                 **kw) -> None:
        super().__init__(dim, **kw)
        self.mesh = mesh
        self.axis = axis
        self.kmeans_sample = kmeans_sample
        # rows per host->device slab during centroid assignment: bounds the
        # build's host temporaries at assign_chunk * dim * 4 bytes
        self.assign_chunk = assign_chunk
        # Incremental mutation: adds stream into the (unsharded, <= 4096 row)
        # FlatIndex append block and merge on host; deletes tag-kill in place
        # inside the sharded lists/overflow via make_sharded_kill using the
        # host slot maps built at compaction.  One /docs/save transfers
        # O(doc); a full rebuild happens only when the append block fills or
        # tombstones pass max_dead_fraction.
        self.incremental = True
        self._sharded_kill = None
        # int32 dense maps (4 bytes/row each): flattened positions index
        # device-resident arrays, so they are bounded far below 2**31
        # (asserted at build)
        self._s_slot_of = np.zeros((0,), np.int32)  # host row -> s*nlist*cap+li*cap+si
        self._s_ov_of = np.zeros((0,), np.int32)    # host row -> s*ov_cap+pos
        self._sivf_fns: dict[tuple, Any] = {}

    def _mesh(self) -> Mesh:
        if self.mesh is None:
            from tpu_rag.parallel.mesh import mesh_from_spec
            self.mesh = mesh_from_spec("")
        return self.mesh

    def _on_vacuum(self) -> None:
        # host rows renumbered: the shard slot maps carry OLD row numbers
        self._s_slot_of = np.zeros((0,), np.int32)
        self._s_ov_of = np.zeros((0,), np.int32)
        self._sharded_kill = None

    def _compact(self) -> dict[str, Any]:
        """Device-side sharded build: each shard's vectors cross host->device
        exactly ONCE (f32, O(n/d_ax) at a time); grouping into padded lists
        (ops/ivf_build.group_lists), final-dtype cast/quantization, and the
        overflow gather all run on device.  Host temporaries stay O(n/d_ax)
        — the previous build materialized the whole padded (d_ax, nlist,
        cap, dim) f32 corpus in host RAM (hundreds of GB at 100M rows)."""
        mesh = self._mesh()
        d_ax = mesh.shape[self.axis]
        live = np.flatnonzero(self._alive)
        n = len(live)
        self._sivf_fns.clear()
        snap: dict[str, Any] = {"rows": live, "n": n, "nlist": 0}
        self._s_slot_of = np.full(len(self._ids), -1, np.int32)
        self._s_ov_of = np.full(len(self._ids), -1, np.int32)
        if n == 0:
            if self.incremental:
                self._alloc_append_block(snap)
            return snap

        # centroids: train on a subsample (device k-means), reuse when valid
        reuse = (self._cached_centroids is not None
                 and self._cached_centroids.shape[1] == self.dim
                 and n <= 2 * max(1, self._centroids_trained_n))
        if not reuse:
            rng = np.random.default_rng(self.seed)
            pick = (np.arange(n) if n <= self.kmeans_sample
                    else rng.choice(n, self.kmeans_sample, replace=False))
            sub = self._vectors[live[pick]]        # O(sample) host copy
            nlist0 = self._auto_nlist(n)
            centroids, _ = kmeans(jnp.asarray(sub), nlist0,
                                  iters=self.kmeans_iters, seed=self.seed)
            self._cached_centroids = np.asarray(centroids)
            self._centroids_trained_n = n
        centroids = np.asarray(self._cached_centroids, np.float32)
        nlist = centroids.shape[0]

        # assign every row to its nearest centroid ON DEVICE in chunks: the
        # (chunk, nlist) score matrix lives in HBM, the host only ever holds
        # one chunk of vectors plus the int32 assignments
        from tpu_rag.ops.kmeans import assign_clusters

        assign = np.empty(n, np.int32)
        cj = jnp.asarray(centroids)
        ch = self.assign_chunk
        for i in range(0, n, ch):
            rows_c = live[i:i + ch]
            assign[i:i + ch] = np.asarray(
                assign_clusters(jnp.asarray(self._vectors[rows_c]), cj))

        # contiguous row shards; uniform (cap, ov_cap) across shards (SPMD)
        bounds = np.linspace(0, n, d_ax + 1).astype(np.int64)
        shard_slices = [slice(bounds[i], bounds[i + 1]) for i in range(d_ax)]
        mean_count = max(1.0, (n / d_ax) / nlist)
        cap = int(max(8, self.list_cap_factor * mean_count))
        cap = max(8, -(-cap // 8) * 8)
        spill = [int(np.maximum(np.bincount(assign[sl], minlength=nlist) - cap,
                                0).sum()) for sl in shard_slices]
        max_spill = max(spill) if spill else 0
        ov_cap = max(8, -(-max_spill // 8) * 8)
        have_ov = max_spill > 0

        # the devices holding shard s: its row along `axis` in the mesh grid
        # (replicated over every other mesh axis)
        axis_pos = list(mesh.axis_names).index(self.axis)
        dev_grid = np.moveaxis(mesh.devices, axis_pos, 0).reshape(d_ax, -1)

        parts: dict[str, list] = {key: [] for key in (
            "vec_lists", "scale_lists", "ns_lists", "canon_lists", "row_lists",
            "ov_vectors", "ov_scales", "ov_ns", "ov_canon", "ov_rows")}
        for s, sl in enumerate(shard_slices):
            blocks = self._build_shard(live[sl], assign[sl], nlist, cap, ov_cap, s)
            for key, arr in blocks.items():
                for dev in dev_grid[s]:
                    parts[key].append(jax.device_put(arr, dev))

        def asm(key: str, shape: tuple):
            spec = P(self.axis, *([None] * (len(shape) - 1)))
            return jax.make_array_from_single_device_arrays(
                shape, NamedSharding(mesh, spec), parts[key])

        snap["vec_lists"] = asm("vec_lists", (d_ax, nlist, cap, self.dim))
        snap["scale_lists"] = asm("scale_lists", (d_ax, nlist, cap))
        snap["ns_lists"] = asm("ns_lists", (d_ax, nlist, cap))
        snap["canon_lists"] = asm("canon_lists", (d_ax, nlist, cap))
        snap["row_lists"] = asm("row_lists", (d_ax, nlist, cap))
        snap["ov_vectors"] = asm("ov_vectors", (d_ax, ov_cap, self.dim))
        snap["ov_scales"] = asm("ov_scales", (d_ax, ov_cap))
        snap["ov_ns"] = asm("ov_ns", (d_ax, ov_cap))
        snap["ov_canon"] = asm("ov_canon", (d_ax, ov_cap))
        snap["ov_rows"] = asm("ov_rows", (d_ax, ov_cap))
        snap["centroids"] = jax.device_put(jnp.asarray(centroids),
                                           NamedSharding(mesh, P()))
        snap["nlist"] = nlist
        snap["have_ov"] = have_ov
        if self.incremental:
            self._alloc_append_block(snap)
        return snap

    def _build_shard(self, rows_s: np.ndarray, a: np.ndarray, nlist: int,
                     cap: int, ov_cap: int, s: int) -> dict[str, Any]:
        """Build ONE shard's inverted lists + overflow block on device and
        return (1, ...)-shaped per-device blocks.  Also records the host
        slot maps incremental deletions use for in-place sharded kills."""
        from tpu_rag.ops.ivf_build import group_lists

        x_s = jnp.asarray(self._vectors[rows_s].astype(np.float32))
        vec_l, ns_l, canon_l, row_l, _, _ = group_lists(
            x_s, jnp.asarray(self._ns[rows_s]), jnp.asarray(self._canon[rows_s]),
            jnp.asarray(rows_s.astype(np.int32)), jnp.asarray(a),
            nlist=nlist, cap=cap)

        # host bookkeeping mirrors group_lists' slot math (ints only)
        order = np.argsort(a, kind="stable")
        sa = a[order]
        starts = np.searchsorted(sa, np.arange(nlist))
        slots = np.arange(len(a)) - starts[sa]
        fits = slots < cap
        in_rows = rows_s[order[fits]]
        assert (s + 1) * nlist * cap < 2**31  # flattened slots must fit int32
        self._s_slot_of[in_rows] = (s * nlist * cap + (sa * cap + slots)[fits]).astype(np.int32)
        sp_pos = order[~fits]
        sp_rows = rows_s[sp_pos]
        assert (s + 1) * ov_cap < 2**31  # flattened overflow pos fits int32
        self._s_ov_of[sp_rows] = (s * ov_cap + np.arange(len(sp_rows))).astype(np.int32)

        if self.dtype == "int8":
            vals, scales = quantize_int8_rows(vec_l.reshape(-1, self.dim))
            vec_fin = vals.reshape(nlist, cap, self.dim)
            sc_fin = scales.reshape(nlist, cap).astype(jnp.float32)
        else:
            jdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            vec_fin = vec_l.astype(jdt)
            sc_fin = jnp.ones((nlist, cap), jnp.float32)

        take = np.zeros(ov_cap, np.int32)
        take[:len(sp_pos)] = sp_pos
        ov_v = x_s[jnp.asarray(take)]          # device gather of spilled rows
        if self.dtype == "int8":
            ov_vals, ov_sc = quantize_int8_rows(ov_v)
            ov_sc = ov_sc.astype(jnp.float32)
        else:
            jdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            ov_vals = ov_v.astype(jdt)
            ov_sc = jnp.ones((ov_cap,), jnp.float32)
        ov_n = np.full(ov_cap, PAD_TAG, np.int32)
        ov_c = np.full(ov_cap, PAD_TAG, np.int32)
        ov_r = np.full(ov_cap, -1, np.int32)
        ov_n[:len(sp_rows)] = self._ns[sp_rows]
        ov_c[:len(sp_rows)] = self._canon[sp_rows]
        ov_r[:len(sp_rows)] = sp_rows

        return {
            "vec_lists": vec_fin[None], "scale_lists": sc_fin[None],
            "ns_lists": ns_l[None], "canon_lists": canon_l[None],
            "row_lists": row_l[None],
            "ov_vectors": ov_vals[None], "ov_scales": ov_sc[None],
            "ov_ns": jnp.asarray(ov_n)[None], "ov_canon": jnp.asarray(ov_c)[None],
            "ov_rows": jnp.asarray(ov_r)[None],
        }

    def _flush_kills(self, snap: dict[str, Any]) -> None:
        """Sharded IVF deletions tag-kill in place wherever the row lives:
        the (unsharded) append block, the sharded inverted lists (host slot
        map -> global flat position -> shard-local scatter), or the sharded
        overflow block.  Transfer is O(deleted rows)."""
        from tpu_rag.index.flat import KILL_GRANULE, _kill_tags_device

        append_slots, main_flat, ov_flat = [], [], []
        for hr in self._pending_dead:
            slot = self._append_slot.get(hr)
            if slot is not None:
                append_slots.append(slot)
                continue
            if hr < len(self._s_slot_of) and self._s_slot_of[hr] >= 0:
                main_flat.append(int(self._s_slot_of[hr]))
                continue
            if hr < len(self._s_ov_of) and self._s_ov_of[hr] >= 0:
                ov_flat.append(int(self._s_ov_of[hr]))
        self._pending_dead.clear()

        def chunked(rows):
            arr = np.asarray(rows, np.int32)
            for i in range(0, len(arr), KILL_GRANULE):
                chunk = arr[i:i + KILL_GRANULE]
                if len(chunk) < KILL_GRANULE:  # pad with a repeat (idempotent)
                    chunk = np.concatenate(
                        [chunk, np.full(KILL_GRANULE - len(chunk), chunk[0],
                                        np.int32)])
                yield jnp.asarray(chunk)

        for chunk in chunked(append_slots):
            snap["a_ns"], snap["a_canon"] = _kill_tags_device(
                snap["a_ns"], snap["a_canon"], chunk)
        if main_flat or ov_flat:
            if self._sharded_kill is None:
                self._sharded_kill = make_sharded_kill(self._mesh(), self.axis)
            for chunk in chunked(main_flat):
                snap["ns_lists"], snap["canon_lists"] = self._sharded_kill(
                    snap["ns_lists"], snap["canon_lists"], chunk)
            for chunk in chunked(ov_flat):
                snap["ov_ns"], snap["ov_canon"] = self._sharded_kill(
                    snap["ov_ns"], snap["ov_canon"], chunk)
        self.snapshot_stats["incremental_kills"] += (
            len(append_slots) + len(main_flat) + len(ov_flat))

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
        k_scan = refine_k_scan(snap.get("dtype", self.dtype), self.refine_factor, k, snap["n"])
        if snap["nlist"] == 0:
            # base snapshot empty — every live row is in the append block
            sc = np.full((nq, k_scan), -np.inf, np.float32)
            hrows = np.full((nq, k_scan), -1, np.int64)
            if snap.get("a_fill", 0) > 0:
                sc, hrows = self._merge_append_block(
                    jnp.asarray(queries), sc, hrows, snap, k_scan,
                    self._wants_2d(want_ns, want_canon))
            if k_scan > k:
                sc, hrows = self._refine_exact(queries, sc, hrows, k, snap=snap)
            return self._to_result(sc, hrows, snap=snap)
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
        if snap.get("a_fill", 0) > 0:
            sc, hrows = self._merge_append_block(
                jnp.asarray(queries), sc, hrows, snap, k_scan,
                self._wants_2d(want_ns, want_canon))
        if k_scan > k:
            sc, hrows = self._refine_exact(queries, sc, hrows, k, snap=snap)
        return self._to_result(sc, hrows, snap=snap)

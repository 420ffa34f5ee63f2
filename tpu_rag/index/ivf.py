"""IVF (inverted-file) approximate index with on-device k-means.

The scale-out answer to hnswlib's HNSW graph (reference vector_store/
segments): the corpus is coarsely clustered (spherical k-means, on device —
tpu_rag/ops/kmeans.py); a query scans only the `nprobe` nearest lists.
Lists are stored padded to a uniform capacity so the probe is a dense
gather + batched matmul (static shapes, MXU-friendly) instead of a
pointer-chasing graph walk.

Streaming ingestion without full rebuild (SURVEY.md §7 "hard parts"):
new rows stream into the FlatIndex device append block (transfer O(new),
see index/flat.py) and are searched exactly alongside the IVF candidates.
At compaction, overflow rows are MERGED into the resident device lists on
device (_merge_overflow_device: centroid-assignment matmul + chunked
scatter into spare list slots — transfer stays O(overflow); the main
partition never crosses the host boundary).  Rows that find no spare slot
stay in the exact overflow buffer; a full re-cluster happens only when
that spill exceeds `rebuild_ratio` of the main partition or the corpus
outgrows the trained centroids (2x).  Deletions tag-kill in place wherever
the row lives (append block, inverted lists via the host slot map, or
overflow).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from tpu_rag.index.flat import FlatIndex, SearchResult, _normalize, refine_k_scan
from tpu_rag.ops.kmeans import kmeans
from tpu_rag.ops.quant import quantize_int8_rows
from tpu_rag.ops.topk import PAD_TAG, topk_xla_reference


def _probe_impl(q, centroids, vec_lists, scale_lists, ns_lists, canon_lists,
                row_lists, wants, *, nprobe: int, k: int):
    """q: (Q, d) f32. Returns (scores (Q, k), rows (Q, k) int32 into live-row space)."""
    sims_c = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, lists = jax.lax.top_k(sims_c, nprobe)                    # (Q, nprobe)
    cand_v = vec_lists[lists]                                   # (Q, nprobe, cap, d)
    scores = jnp.einsum("qd,qpcd->qpc", q, cand_v.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    scores = scores * scale_lists[lists]
    ns = ns_lists[lists]
    canon = canon_lists[lists]
    want_ns, want_canon = wants[0], wants[1]
    ok = (ns != PAD_TAG)
    ok &= (want_ns < 0) | (ns == want_ns)
    ok &= (want_canon < 0) | (canon == want_canon)
    scores = jnp.where(ok, scores, -jnp.inf)
    qn = q.shape[0]
    flat_scores = scores.reshape(qn, -1)
    flat_rows = row_lists[lists].reshape(qn, -1)
    k_eff = min(k, flat_scores.shape[1])
    top_sc, pos = jax.lax.top_k(flat_scores, k_eff)
    top_rows = jnp.take_along_axis(flat_rows, pos, axis=1)
    top_rows = jnp.where(jnp.isneginf(top_sc), -1, top_rows)
    return top_sc, top_rows


_ivf_probe = jax.jit(_probe_impl, static_argnames=("nprobe", "k"))

MERGE_GRANULE = 256


def _merge_rows_impl(vec_lists, scale_lists, ns_lists, canon_lists, row_lists,
                     l_idx, s_idx, vals, scales, ns, canon, rows):
    """Scatter one MERGE_GRANULE chunk of overflow rows into their (list,
    slot) positions.  Padding entries repeat the first row (same indices +
    same values -> idempotent)."""
    vec_lists = vec_lists.at[l_idx, s_idx].set(vals)
    scale_lists = scale_lists.at[l_idx, s_idx].set(scales)
    ns_lists = ns_lists.at[l_idx, s_idx].set(ns)
    canon_lists = canon_lists.at[l_idx, s_idx].set(canon)
    row_lists = row_lists.at[l_idx, s_idx].set(rows)
    return vec_lists, scale_lists, ns_lists, canon_lists, row_lists


# first chunk: the inputs are the PREVIOUS snapshot's arrays, which
# in-flight searches may still hold — copy, don't donate.  Later chunks own
# their (fresh) inputs, so donation makes the scatter in-place instead of
# copying the full (nlist, cap, d) lists once per chunk.
_merge_rows_device = jax.jit(_merge_rows_impl)
_merge_rows_device_donated = jax.jit(_merge_rows_impl,
                                     donate_argnums=(0, 1, 2, 3, 4))


class IVFIndex(FlatIndex):
    kind = "ivf"

    def __init__(
        self,
        dim: int,
        *,
        dtype: str = "bfloat16",
        metric: str = "cosine",
        use_pallas: bool = True,
        block_n: int = 2048,
        search_mode: str = "exact",
        nlist: int = 0,
        nprobe: int = 8,
        kmeans_iters: int = 15,
        rebuild_ratio: float = 0.2,
        list_cap_factor: float = 1.5,
        seed: int = 0,
        master_backing: str | None = None,
        master_dir: str | None = None,
        docmeta_backing: str | None = None,
    ) -> None:
        """list_cap_factor bounds the padded-list memory: each list holds at
        most cap = factor * (n/nlist) rows; rows beyond the cap spill into
        the exact overflow buffer.  Keeps HBM use predictable at 10M+ scale
        (a max-sized cap can be several x the mean on skewed data)."""
        super().__init__(dim, dtype=dtype, metric=metric, use_pallas=use_pallas,
                         block_n=block_n, search_mode=search_mode,
                         master_backing=master_backing, master_dir=master_dir,
                         docmeta_backing=docmeta_backing)
        self.nlist = nlist
        self.nprobe = nprobe
        self.kmeans_iters = kmeans_iters
        self.rebuild_ratio = rebuild_ratio
        self.list_cap_factor = list_cap_factor
        self.seed = seed
        # host row -> flattened list*cap+slot position in the device lists
        # (-1 = not in the main partition).  int32: the flattened main
        # partition is a resident device array, so nlist*cap is bounded far
        # below 2**31 (asserted at build).  This dense map is the ONLY
        # per-row IVF bookkeeping kept on host (4 bytes/row; the old
        # int64 row list + int64 slot map was 16): membership is derived
        # as flatnonzero(_main_slot_of >= 0) where needed.
        self._main_slot_of: np.ndarray = np.zeros((0,), np.int32)
        self._ov_fn_cache: dict[int, Any] = {}  # jitted overflow search per k
        self._cached_centroids: np.ndarray | None = None  # persisted / last build
        self._centroids_trained_n = 0
        self._list_fill: np.ndarray | None = None  # per-list occupied slots

    # ------------------------------------------------------------- build

    def _auto_nlist(self, n: int) -> int:
        if self.nlist > 0:
            return min(self.nlist, n)
        return max(1, min(int(np.sqrt(n) * 2), n // 8 or 1))

    def _on_vacuum(self) -> None:
        # host rows renumbered: the list-membership maps carry OLD row
        # numbers — drop them so the next _compact rebuilds from scratch
        self._main_slot_of = np.zeros((0,), np.int32)
        self._list_fill = None

    def _compact(self) -> dict[str, Any]:
        live = np.flatnonzero(self._alive)
        n = len(live)
        snap: dict[str, Any] = {"rows": live, "n": n}
        overflow_mask = np.ones(n, bool)

        # main-partition membership is derived from the slot map: a host row
        # is "main" iff it has a list slot.  Dead main rows keep their slot
        # until the next rebuild (the device-side aliveness filter hides
        # them), so intersect with the live set here.
        in_main = np.flatnonzero(self._main_slot_of >= 0)
        main_rows = in_main[self._alive[in_main]] if len(in_main) else np.zeros((0,), np.int64)
        overflow = n - len(main_rows)
        need_rebuild = (
            len(main_rows) == 0
            or overflow > max(64, int(self.rebuild_ratio * max(1, len(main_rows))))
        )
        if need_rebuild and n > 0:
            main_rows = live

        prev = self._device
        reuse_centroids = (
            self._cached_centroids is not None
            and self._cached_centroids.shape[1] == self.dim
            # retrain when the corpus has grown well past what the
            # centroids were trained on
            and len(main_rows) <= 2 * max(1, self._centroids_trained_n)
        )
        # Main-partition device reuse: if the clustering isn't changing and
        # the previous snapshot's lists are resident, keep them — no rows of
        # the main partition cross host->device.  Dead main rows are handled
        # by the host-side aliveness filter until the next rebuild; rows can
        # only ENTER main via a rebuild, so the resident lists stay a
        # superset of live main rows.
        can_reuse_device = (
            not need_rebuild and reuse_centroids and prev is not None
            and prev.get("nlist", 0) > 0
        )
        if can_reuse_device:
            for key in ("vec_lists", "scale_lists", "centroids", "ns_lists",
                        "canon_lists", "row_lists", "nlist"):
                snap[key] = prev[key]
            # Dead main rows still occupy the reused list slots, and their
            # incremental tag kills may have been SKIPPED: _note_dead stages
            # nothing once _dirty is set (compact()/threshold), expecting a
            # full rebuild to drop them — but this branch keeps the old
            # lists.  Kill every dead-but-slotted row here, then drop it
            # from the slot map (dead rows never revive), so each dead row
            # is swept at most once across reuse snapshots rather than
            # re-uploaded on every compact.
            dead_main = in_main[~self._alive[in_main]] if len(in_main) else in_main
            if len(dead_main):
                self._kill_main_slots(snap, self._main_slot_of[dead_main])
                self._main_slot_of[dead_main] = -1
            overflow_mask[np.isin(live, main_rows)] = False
            # streaming build: absorb overflow rows into the resident lists
            # on device (assignment matmul + chunked scatter — transfer is
            # O(overflow), nothing of the main partition moves).  Rows that
            # find no spare list slot stay in the exact overflow buffer; a
            # full rebuild happens only when spill keeps accumulating past
            # rebuild_ratio or the corpus outgrows the centroids.
            remaining = self._merge_overflow_device(snap, live[overflow_mask])
            overflow_mask = np.isin(live, remaining)
        elif len(main_rows) > 0:
            from tpu_rag.ops.ivf_build import group_lists
            from tpu_rag.ops.kmeans import assign_clusters

            # single corpus upload: k-means and grouping share this array
            x_dev = jnp.asarray(self._vectors[main_rows].astype(np.float32))
            if reuse_centroids:
                # persisted / previous centroids: skip k-means, just
                # re-assign (one pass) — makes reload fast at scale
                centroids = self._cached_centroids
                assign = np.asarray(assign_clusters(x_dev, jnp.asarray(centroids)))
            else:
                nlist = self._auto_nlist(len(main_rows))
                centroids, assign = kmeans(x_dev, nlist, iters=self.kmeans_iters, seed=self.seed)
                self._centroids_trained_n = len(main_rows)
            self._cached_centroids = centroids
            nlist = centroids.shape[0]
            counts = np.bincount(assign, minlength=nlist)
            mean_count = max(1.0, len(main_rows) / nlist)
            cap = int(min(counts.max(), max(8, self.list_cap_factor * mean_count)))
            # round the list capacity to the TPU tile height (int8 arrays
            # tile as (32, 128), f32/bf16 as (8/16, 128)) so each probed
            # (cap, d) list block DMAs as whole tiles with no ragged edge
            # and no layout padding waste
            cap = max(8, -(-cap // 8) * 8)
            if cap > 128:
                cap = -(-cap // 128) * 128

            # grouping happens on device (tpu_rag/ops/ivf_build.py); only the
            # small tag/row arrays and the fits mask cross the host boundary.
            # row_lists carries HOST rows, so probe results stay valid across
            # later snapshots (host rows are stable for an index's lifetime).
            vec_lists, ns_lists, canon_lists, row_lists, order, fits = group_lists(
                x_dev,
                jnp.asarray(self._ns[main_rows]),
                jnp.asarray(self._canon[main_rows]),
                jnp.asarray(main_rows.astype(np.int32)),
                jnp.asarray(assign),
                nlist=nlist, cap=cap,
            )

            fits_np = np.asarray(fits)
            order_np = np.asarray(order)
            # cap-spilled rows simply get no slot; overflow handles them

            # host map: main host row -> flattened (list, slot) position, so
            # later deletions can tag-kill main rows in place on device.
            # Mirrors the slot math in ops/ivf_build.group_lists.
            in_lists_rows = main_rows[order_np[fits_np]]
            assert nlist * cap < 2**31  # flattened slots must fit int32
            sorted_assign = assign[order_np]
            starts = np.searchsorted(sorted_assign, np.arange(nlist))
            slots = np.arange(len(sorted_assign)) - starts[sorted_assign]
            slot_map = np.full(len(self._ids), -1, np.int32)
            slot_map[in_lists_rows] = (sorted_assign * cap + slots)[fits_np].astype(np.int32)
            self._main_slot_of = slot_map
            # per-list occupancy, the device-merge path's free-slot ledger
            self._list_fill = np.bincount(sorted_assign[fits_np],
                                          minlength=nlist).astype(np.int64)

            if self.dtype == "int8":
                vals, scales = quantize_int8_rows(vec_lists.reshape(-1, self.dim))
                snap["vec_lists"] = vals.reshape(nlist, cap, self.dim)
                snap["scale_lists"] = scales.reshape(nlist, cap)
            else:
                jdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
                snap["vec_lists"] = vec_lists.astype(jdt)
                snap["scale_lists"] = jnp.ones((nlist, cap), jnp.float32)
            snap["centroids"] = jnp.asarray(centroids)
            snap["ns_lists"] = ns_lists
            snap["canon_lists"] = canon_lists
            snap["row_lists"] = row_lists
            snap["nlist"] = nlist
            # only rows actually placed in lists leave the overflow set
            overflow_mask[np.isin(live, in_lists_rows)] = False
        else:
            snap["nlist"] = 0

        # Overflow (cap-spilled / pre-recluster) rows searched exactly.
        ov_rows = live[overflow_mask]
        snap["ov_rows"] = ov_rows
        if len(ov_rows):
            snap["ov_vectors"] = jnp.asarray(self._vectors[ov_rows], jnp.float32)
            snap["ov_ns"] = jnp.asarray(self._ns[ov_rows])
            snap["ov_canon"] = jnp.asarray(self._canon[ov_rows])
            # overflow-local index -> host row, resident on device
            snap["ov_live"] = jnp.asarray(ov_rows.astype(np.int32))
        if self.incremental:
            self._alloc_append_block(snap)
        # search functions are snapshot-shape-specific
        self._ov_fn_cache.clear()
        return snap

    def _merge_overflow_device(self, snap: dict[str, Any],
                               ov_rows: np.ndarray) -> np.ndarray:
        """Merge overflow rows into the resident device lists: assign each to
        its nearest centroid on device, then scatter rows into lists with
        spare capacity (MERGE_GRANULE chunks).  Returns the rows that found
        no slot (they stay in the exact overflow buffer).  Transfers:
        O(overflow) up (the rows), O(overflow) down (the assignments)."""
        nlist = snap.get("nlist", 0)
        if nlist == 0 or len(ov_rows) == 0 or self._list_fill is None:
            return ov_rows
        cap = snap["vec_lists"].shape[1]
        fill = self._list_fill
        if int(np.sum(cap - np.minimum(fill, cap))) <= 0:
            return ov_rows
        from tpu_rag.ops.kmeans import assign_clusters

        x_ov = jnp.asarray(self._vectors[ov_rows].astype(np.float32))
        assign = np.asarray(assign_clusters(x_ov, snap["centroids"])).astype(np.int64)

        # rank each row within its target list; rows past the cap spill
        order = np.argsort(assign, kind="stable")
        sa = assign[order]
        within = np.arange(len(sa)) - np.searchsorted(sa, sa)
        cand_slot = fill[sa] + within
        ok = cand_slot < cap
        slots = np.full(len(ov_rows), -1, np.int64)
        slots[order[ok]] = cand_slot[ok]
        sel = slots >= 0
        if not sel.any():
            return ov_rows

        sel_idx = np.flatnonzero(sel)
        l_idx_np = assign[sel].astype(np.int32)
        s_idx_np = slots[sel].astype(np.int32)
        rows_np = ov_rows[sel].astype(np.int32)
        ns_np = self._ns[ov_rows[sel]].astype(np.int32)
        canon_np = self._canon[ov_rows[sel]].astype(np.int32)
        x_sel = x_ov[jnp.asarray(sel_idx.astype(np.int32))]
        if self.dtype == "int8":
            vals_dev, scales_dev = quantize_int8_rows(x_sel)
        else:
            jdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            vals_dev = x_sel.astype(jdt)
            scales_dev = jnp.ones((len(sel_idx),), jnp.float32)

        n_sel = len(sel_idx)
        for i in range(0, n_sel, MERGE_GRANULE):
            j = min(i + MERGE_GRANULE, n_sel)
            idx = np.arange(i, j)
            if len(idx) < MERGE_GRANULE:  # idempotent repeat padding
                idx = np.concatenate([idx, np.full(MERGE_GRANULE - len(idx), i)])
            ij = jnp.asarray(idx.astype(np.int32))
            merge_fn = _merge_rows_device if i == 0 else _merge_rows_device_donated
            (snap["vec_lists"], snap["scale_lists"], snap["ns_lists"],
             snap["canon_lists"], snap["row_lists"]) = merge_fn(
                snap["vec_lists"], snap["scale_lists"], snap["ns_lists"],
                snap["canon_lists"], snap["row_lists"],
                jnp.asarray(l_idx_np[idx]), jnp.asarray(s_idx_np[idx]),
                vals_dev[ij], scales_dev[ij],
                jnp.asarray(ns_np[idx]), jnp.asarray(canon_np[idx]),
                jnp.asarray(rows_np[idx]))

        # host bookkeeping: merged rows are main now (membership IS the
        # slot map — see _compact)
        merged = ov_rows[sel]
        self._list_fill = fill + np.bincount(assign[sel], minlength=nlist)
        if len(self._main_slot_of) < len(self._ids):
            self._main_slot_of = np.concatenate(
                [self._main_slot_of,
                 np.full(len(self._ids) - len(self._main_slot_of), -1, np.int32)])
        self._main_slot_of[merged] = (assign[sel] * cap + slots[sel]).astype(np.int32)
        self.snapshot_stats["ivf_device_merges"] = (
            self.snapshot_stats.get("ivf_device_merges", 0) + int(sel.sum()))
        return ov_rows[~sel]

    def _kill_main_slots(self, snap: dict[str, Any], slots) -> None:
        """Tag-kill main-partition rows on device, addressed by flattened
        list*cap+slot positions (chunked uploads, KILL_GRANULE granule)."""
        from tpu_rag.index.flat import KILL_GRANULE, _kill_tags_2d_device

        arr = np.asarray(slots, np.int32)
        for i in range(0, len(arr), KILL_GRANULE):
            chunk = arr[i:i + KILL_GRANULE]
            if len(chunk) < KILL_GRANULE:  # pad with a repeat (idempotent set)
                chunk = np.concatenate(
                    [chunk, np.full(KILL_GRANULE - len(chunk), chunk[0], np.int32)])
            snap["ns_lists"], snap["canon_lists"] = _kill_tags_2d_device(
                snap["ns_lists"], snap["canon_lists"], jnp.asarray(chunk))

    def _flush_kills(self, snap: dict[str, Any]) -> None:
        """IVF deletions tag-kill in place on device, wherever the row lives:
        the append block, the main inverted lists (via the host slot map), or
        the exact-overflow buffer.  Transfer is O(deleted rows)."""
        from tpu_rag.index.flat import KILL_GRANULE, _kill_tags_device

        append_slots, main_slots, ov_pos = [], [], []
        ov_rows = snap.get("ov_rows", np.zeros((0,), np.int64))
        for hr in self._pending_dead:
            slot = self._append_slot.get(hr)
            if slot is not None:
                append_slots.append(slot)
                continue
            if hr < len(self._main_slot_of) and self._main_slot_of[hr] >= 0:
                main_slots.append(int(self._main_slot_of[hr]))
                # slot is PAD on device now; dropping it from the map keeps
                # the reuse-path dead sweep from re-killing this row
                self._main_slot_of[hr] = -1
                continue
            pos = int(np.searchsorted(ov_rows, hr))
            if pos < len(ov_rows) and ov_rows[pos] == hr:
                ov_pos.append(pos)
        self._pending_dead.clear()

        def chunked(rows):
            arr = np.asarray(rows, np.int32)
            for i in range(0, len(arr), KILL_GRANULE):
                chunk = arr[i:i + KILL_GRANULE]
                if len(chunk) < KILL_GRANULE:  # pad with a repeat (idempotent set)
                    chunk = np.concatenate([chunk, np.full(KILL_GRANULE - len(chunk),
                                                           chunk[0], np.int32)])
                yield jnp.asarray(chunk)

        for chunk in chunked(append_slots):
            snap["a_ns"], snap["a_canon"] = _kill_tags_device(
                snap["a_ns"], snap["a_canon"], chunk)
        for chunk in chunked(ov_pos):
            snap["ov_ns"], snap["ov_canon"] = _kill_tags_device(
                snap["ov_ns"], snap["ov_canon"], chunk)
        if main_slots:
            self._kill_main_slots(snap, main_slots)
        self.snapshot_stats["incremental_kills"] += (
            len(append_slots) + len(main_slots) + len(ov_pos))

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
            empty = [[] for _ in range(nq)]
            return SearchResult(ids=[list() for _ in range(nq)], similarities=empty,
                                distances=[list() for _ in range(nq)], rows=[list() for _ in range(nq)],
                                metadatas=[list() for _ in range(nq)], documents=[list() for _ in range(nq)])

        snap = self.device_snapshot()
        qj = jnp.asarray(queries)
        # one fused jitted call: probe + overflow + merge all on device
        # (per-call host<->device transfers cost a full RTT on tunneled
        # backends; this path does exactly one upload and two readbacks)
        wants = self._wants_cache.get((want_ns, want_canon))
        if wants is None:
            wants = jnp.array([[want_ns, want_canon]], jnp.int32)
            self._wants_cache[(want_ns, want_canon)] = wants
        nprobe = min(self.nprobe, snap["nlist"]) if snap["nlist"] > 0 else 0
        have_main = snap["nlist"] > 0
        have_ov = len(snap["ov_rows"]) > 0
        # int8 two-stage refine (same as FlatIndex)
        k_scan = refine_k_scan(snap.get("dtype", self.dtype), self.refine_factor, k, snap["n"])
        key = (k_scan, nprobe, have_main, have_ov,
               snap["nlist"], len(snap["ov_rows"]))
        fn = self._ov_fn_cache.get(key)
        if fn is None:
            fn = self._build_search_fn(k_scan, nprobe, have_main, have_ov)
            self._ov_fn_cache[key] = fn
        args = [qj, wants]
        if have_main:
            args += [snap["centroids"], snap["vec_lists"], snap["scale_lists"],
                     snap["ns_lists"], snap["canon_lists"], snap["row_lists"]]
        if have_ov:
            args += [snap["ov_vectors"], snap["ov_ns"], snap["ov_canon"],
                     snap["ov_live"]]
        sc, rows = fn(*args)
        # rows are HOST rows (row_lists/ov_live carry host row ids)
        sc, hrows = np.asarray(sc), np.asarray(rows).astype(np.int64)
        hrows = np.where(np.isfinite(sc), hrows, -1)
        if snap.get("a_fill", 0) > 0:
            sc, hrows = self._merge_append_block(qj, sc, hrows, snap, k_scan, wants)
        if k_scan > k:
            sc, hrows = self._refine_exact(queries, sc, hrows, k, snap=snap)
        return self._to_result(sc, hrows, snap=snap)

    def _build_search_fn(self, k: int, nprobe: int, have_main: bool, have_ov: bool):
        """Fused device-side probe + exact-overflow + merge, jitted."""

        use_pallas_probe = self.use_pallas
        interpret = jax.default_backend() != "tpu"

        def run(q, wants, *rest):
            i = 0
            parts_sc, parts_rows = [], []
            if have_main:
                centroids, vec_lists, scale_lists, ns_lists, canon_lists, row_lists = rest[:6]
                i = 6
                cap = vec_lists.shape[1]
                k_main = min(k, nprobe * cap)
                from tpu_rag.ops.ivf_probe import _K_EFF_MAX
                if (use_pallas_probe and q.shape[0] >= 4
                        and cap % 128 == 0
                        and k_main <= nprobe * 2 * (cap // 128)):
                    # batch-shared probe: the union of the batch's probed
                    # lists is DMA'd once and scored against every query on
                    # the MXU (round-5; the per-(query,probe) grid below
                    # re-fetches each list once per query that probes it)
                    from tpu_rag.ops.ivf_probe import ivf_probe_batched
                    sc1, rows1 = ivf_probe_batched(
                        q, centroids, vec_lists, scale_lists, ns_lists,
                        canon_lists, row_lists, wants[0], nprobe=nprobe,
                        k=k_main, interpret=interpret)
                elif use_pallas_probe and min(k_main, cap) <= _K_EFF_MAX:
                    from tpu_rag.ops.ivf_probe import ivf_probe_pallas
                    sc1, rows1 = ivf_probe_pallas(
                        q, centroids, vec_lists, scale_lists, ns_lists,
                        canon_lists, row_lists, wants[0], nprobe=nprobe,
                        k=k_main, interpret=interpret)
                else:
                    sc1, rows1 = _probe_impl(
                        q, centroids, vec_lists, scale_lists, ns_lists,
                        canon_lists, row_lists, wants[0], nprobe=nprobe, k=k_main)
                parts_sc.append(sc1)
                parts_rows.append(rows1)
            if have_ov:
                ov_vec, ov_ns, ov_canon, ov_live = rest[i:i + 4]
                k_ov = min(k, ov_vec.shape[0])
                sc2, idx2 = topk_xla_reference(
                    q, ov_vec, k_ov, ns_tags=ov_ns, canon_tags=ov_canon,
                    want_ns=wants[0, 0], want_canon=wants[0, 1])
                rows2 = jnp.where(idx2 >= 0, ov_live[jnp.clip(idx2, 0, None)], -1)
                parts_sc.append(sc2)
                parts_rows.append(rows2)
            all_sc = jnp.concatenate(parts_sc, axis=1)
            all_rows = jnp.concatenate(parts_rows, axis=1)
            k_eff = min(k, all_sc.shape[1])
            top_sc, pos = jax.lax.top_k(all_sc, k_eff)
            top_rows = jnp.take_along_axis(all_rows, pos, axis=1)
            return top_sc, top_rows

        return jax.jit(run)

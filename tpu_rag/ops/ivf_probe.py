"""Pallas IVF probe kernel: scalar-prefetch gather + fused scoring + in-kernel
per-list top-k.

The XLA probe path (tpu_rag/index/ivf.py _probe_impl) materializes the
gathered candidates (Q, nprobe, cap, d) in HBM before the einsum — at
nprobe=64, cap=768, d=384 that's ~3GB of gather traffic for an 8-query
batch.  This kernel instead uses PrefetchScalarGridSpec: the selected list
ids are prefetched scalars, and each grid step DMAs exactly one (cap, d)
list block straight into VMEM and scores it against its query.

Round-4 rework: the kernel also selects the per-list top-k IN KERNEL (exact,
lowest-index tie-break — identical ordering to lax.top_k over the flat
scores).  The old kernel wrote every (cap,) score row back to HBM and ranked
with one giant lax.top_k over (Q, nprobe*cap) — at 10M rows (cap 4992,
nprobe 64, 32 queries) that is a 40 MB score tensor, an equally large
row-id gather, and a 320K-wide top_k, which dominated the probe at ~170 ms
per batch (~5% of the DMA floor, BENCH round-4 interim capture).  Writing
only (k,) scores + ids per list shrinks the epilogue by cap/k (~500x) and
the final merge runs over nprobe*k candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_rag.ops.topk import PAD_TAG, _round_up

_LANE = 128

# Upper bound on the in-kernel unrolled top-k pass count (ADVICE r4): above
# this the kernel size / compile time grow without bound; callers fall back
# to the XLA probe.
_K_EFF_MAX = 128


def _probe_topk_kernel(lists_ref, wants_ref, q_ref, vec_ref, scale_ref,
                       ns_ref, canon_ref, sc_ref, id_ref, *, cap: int,
                       k_eff: int, kpad: int, is_int8: bool):
    if is_int8:
        # native int8 x int8 MXU matmul with int32 accumulation — the same
        # recipe as ops/topk _topk_tile_kernel.  The f32 upcast this kernel
        # used through round 4 kept the dot off the int8 MXU path and made
        # the probe compute-bound at ~120ms/batch regardless of nprobe
        # (round-5 sweep) while the flat kernel scanned ALL 10M rows in 8ms.
        # The per-QUERY scale is applied by the caller after the kernel
        # (constant per query -> order-preserving); the per-ROW scale must
        # stay in-kernel because it reorders candidates.
        x = vec_ref[0]                              # (cap, d) int8
        qv = q_ref[0]                               # (1, d) int8
        s = jax.lax.dot_general(
            x, qv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32).T                     # (1, cap)
        s = s * scale_ref[0]                        # (1, cap) db-row scales
    else:
        # f32 operands (bf16 upcast in VMEM): Mosaic rejects bf16 matvec
        # with f32 accumulation at this shape (vector.broadcast verification
        # error), and f32 stays bit-exact vs _probe_impl (parity tests)
        x = vec_ref[0].astype(jnp.float32)          # (cap, d)
        qv = q_ref[0].astype(jnp.float32)           # (1, d) — this step's query
        s = jax.lax.dot_general(
            x, qv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).T                                         # (1, cap)
    ns = ns_ref[0]                                  # (1, cap)
    canon = canon_ref[0]                            # (1, cap)
    want_ns = wants_ref[0]
    want_canon = wants_ref[1]
    ok = (ns != PAD_TAG)
    ok &= (want_ns < 0) | (ns == want_ns)
    ok &= (want_canon < 0) | (canon == want_canon)
    neg_inf = jnp.float32(-jnp.inf)
    s = jnp.where(ok, s, neg_inf)

    # exact top-k_eff with lowest-index tie-break — the same candidate
    # ordering lax.top_k produces over the flat per-list scores, so the
    # host-side merge reproduces _probe_impl bit for bit
    col = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, kpad), 1)
    sc_acc = jnp.full((1, kpad), neg_inf, jnp.float32)
    id_acc = jnp.full((1, kpad), -1, jnp.int32)
    for j in range(k_eff):
        m = jnp.max(s, axis=1, keepdims=True)                 # (1, 1)
        is_m = s == m
        idx = jnp.min(jnp.where(is_m, col, jnp.int32(cap)),
                      axis=1, keepdims=True)                  # first winner
        sc_acc = jnp.where(kcol == j, m, sc_acc)
        id_acc = jnp.where(kcol == j, idx, id_acc)
        s = jnp.where(col == idx, neg_inf, s)                 # knock it out
    sc_ref[0, 0] = sc_acc
    id_ref[0, 0] = id_acc


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "interpret"))
def ivf_probe_pallas(q, centroids, vec_lists, scale_lists, ns_lists,
                     canon_lists, row_lists, wants, *, nprobe: int, k: int,
                     interpret: bool = False):
    """Same contract as ivf._probe_impl: returns (scores (Q,k), live rows (Q,k)).

    q: (Q, d) f32; vec_lists: (nlist, cap, d); wants: (2,) int32.

    Bound: the in-kernel top-k unrolls min(k, cap) max-reduce passes per
    grid step, so kernel size and compile time grow linearly in k.  Callers
    passing an oversampled k_scan above _K_EFF_MAX must use the XLA probe
    path (ivf._probe_impl) instead — this entry point raises rather than
    silently compiling a megakernel.
    """
    qn, d = q.shape
    nlist, cap, _ = vec_lists.shape
    if min(k, cap) > _K_EFF_MAX:
        raise ValueError(
            f"ivf_probe_pallas: k_eff={min(k, cap)} exceeds _K_EFF_MAX="
            f"{_K_EFF_MAX} (the per-list top-k is unrolled in-kernel); "
            "use the XLA probe path for larger oversampled k_scan")
    is_int8 = vec_lists.dtype == jnp.int8

    sims_c = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, lists = jax.lax.top_k(sims_c, nprobe)           # (Q, nprobe)
    lists_flat = lists.reshape(-1).astype(jnp.int32)   # scalar prefetch

    # int8 lists quantize the QUERIES too (ops/topk fused_matmul_topk does
    # the same): the kernel contracts int8 x int8 on the MXU with int32
    # accumulation, and the per-query scale — constant within a query, so
    # order-preserving — is applied to the final top-k scores below
    if is_int8:
        from tpu_rag.ops.quant import quantize_int8_rows

        q8, qscale = quantize_int8_rows(q.astype(jnp.float32))
        q_in = q8
    else:
        compute_dtype = (jnp.bfloat16 if vec_lists.dtype == jnp.bfloat16
                         else vec_lists.dtype)
        q_in = q.astype(compute_dtype)
        qscale = None
    # singleton middle axis: (1, 1, d) query blocks indexed by the grid
    # (dynamic in-kernel row slices can't be proven sublane-aligned)
    q3 = q_in.reshape(qn, 1, d)
    # singleton middle axis so (1, 1, cap) blocks satisfy the (sublane, lane)
    # tiling rules (second-to-last block dim == full array dim 1)
    scale3 = scale_lists.reshape(nlist, 1, cap)
    ns3 = ns_lists.reshape(nlist, 1, cap)
    canon3 = canon_lists.reshape(nlist, 1, cap)

    k_eff = min(k, cap)
    kpad = _round_up(max(k_eff, 1), _LANE)
    kern = functools.partial(_probe_topk_kernel, cap=cap, k_eff=k_eff,
                             kpad=kpad, is_int8=is_int8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # lists_flat, wants
        grid=(qn, nprobe),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda qi, pi, lists, wants: (qi, 0, 0)),
            pl.BlockSpec((1, cap, d),
                         lambda qi, pi, lists, wants: (lists[qi * nprobe + pi], 0, 0)),
            pl.BlockSpec((1, 1, cap),
                         lambda qi, pi, lists, wants: (lists[qi * nprobe + pi], 0, 0)),
            pl.BlockSpec((1, 1, cap),
                         lambda qi, pi, lists, wants: (lists[qi * nprobe + pi], 0, 0)),
            pl.BlockSpec((1, 1, cap),
                         lambda qi, pi, lists, wants: (lists[qi * nprobe + pi], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, kpad),
                         lambda qi, pi, lists, wants: (qi, pi, 0, 0)),
            pl.BlockSpec((1, 1, 1, kpad),
                         lambda qi, pi, lists, wants: (qi, pi, 0, 0)),
        ],
    )
    sc_l, id_l = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((qn, nprobe, 1, kpad), jnp.float32),
                   jax.ShapeDtypeStruct((qn, nprobe, 1, kpad), jnp.int32)],
        interpret=interpret,
    )(lists_flat, wants.astype(jnp.int32), q3, vec_lists, scale3,
      ns3, canon3)
    sc_l = sc_l[:, :, 0, :k_eff]                       # (Q, nprobe, k_eff)
    id_l = id_l[:, :, 0, :k_eff]

    # merge the per-list winners: candidates are ordered (probe-major,
    # in-list-rank-minor), which for equal scores matches the flat
    # (probe-major, in-list-index-minor) order _probe_impl ranks over, so
    # lax.top_k's lowest-index tie-break yields identical rows
    flat_scores = sc_l.reshape(qn, nprobe * k_eff)
    # gather ONLY the selected rows' ids: lists*cap + local index into the
    # flattened row map (the old (Q, nprobe, cap) row gather was 40 MB at
    # 10M scale)
    safe_local = jnp.maximum(id_l, 0)
    gidx = (lists[:, :, None].astype(jnp.int32) * cap + safe_local)
    flat_rows = row_lists.reshape(-1)[gidx.reshape(qn, -1)]
    flat_rows = jnp.where(id_l.reshape(qn, -1) < 0, -1, flat_rows)
    k_out = min(k, nprobe * k_eff)
    top_sc, pos = jax.lax.top_k(flat_scores, k_out)
    top_rows = jnp.take_along_axis(flat_rows, pos, axis=1)
    top_rows = jnp.where(jnp.isneginf(top_sc), -1, top_rows)
    if qscale is not None:
        # per-query int8 scale: positive, so -inf sentinels survive
        top_sc = top_sc * qscale[:, None]
    return top_sc, top_rows


# --------------------------------------------------------------------------
# Batch-shared probe (round 5): the per-(query, probe) grid above DMAs each
# probed list once PER QUERY — at 10M rows (qbatch 32, nprobe 64, cap 4992,
# int8) that is ~3.9 GB per batch, the same bytes as ONE full-corpus scan
# that would have served every query exactly (VERDICT r4 "missing #1": IVF
# strictly dominated by brute force).  This kernel inverts the grid: it
# iterates the DEDUPED UNION of lists probed by the whole batch, DMAs each
# list block ONCE, and scores it against ALL Q queries with a real matmul
# ((Q, d) x (d, cap) on the MXU instead of a matvec).  DMA per batch drops
# from Q*nprobe list blocks to |union| blocks.
#
# Epilogue: the per-list selection is the ONE-PASS bucketed reduction from
# ops/topk.py (per-128-lane-bucket top-m maxima), NOT k unrolled max-reduce
# passes — the round-4 per-(query,probe) probe measured ~120 ms/batch FLAT
# across nprobe, i.e. epilogue/overhead-bound, and a k-pass epilogue over a
# (Q, cap) tile per step would stay there.  bucket_m=2 keeps the top-2 per
# bucket: IVF concentrates a query's true top-k inside few lists, so two of
# them sharing a 128-lane bucket is common (a top-1 bucket reduction loses
# measurable recall) while three sharing one is rare.
#
# The merge gathers, per query, ONLY its own nprobe lists' bucket maxima
# (via the dedup inverse map) — candidate semantics identical to
# _probe_impl/ivf_probe_pallas, and the final top_k runs over
# nprobe*(cap/128)*m lanes per query, not |union|*... (the giant-epilogue
# trap the round-4 docstring above documents).
# --------------------------------------------------------------------------

_BUCKET = 128  # one TPU lane register per bucket, same as ops/topk bucketed


def _batched_bucket_kernel(uniq_ref, nu_ref, wants_ref, q_ref, vec_ref,
                           scale_ref, ns_ref, canon_ref, sc_ref, id_ref, *,
                           cap: int, qp: int, nb: int, m: int, is_int8: bool):
    step = pl.program_id(0)
    neg_inf = jnp.float32(-jnp.inf)

    @pl.when(step < nu_ref[0])
    def _live():
        x = vec_ref[0]                                     # (cap, d)
        if is_int8:
            # native int8 x int8 MXU matmul, int32 accumulation — the flat
            # kernel's recipe (ops/topk.py _topk_tile_kernel).  The DB tile
            # streams through the systolic array with the small query matrix
            # stationary; the f32-upcast dot this kernel used at first kept
            # it off the int8 MXU path (~120ms/batch flat across nprobe,
            # round-5 sweep).  Per-QUERY int8 scales are applied by the
            # caller after the merge (order-preserving within a query).
            s_t = jax.lax.dot_general(
                x, q_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                              # (cap, qp) int32
            s = s_t.astype(jnp.float32).T                  # (qp, cap)
            s = s * scale_ref[0]                           # db scales (1, cap)
        else:
            s = jax.lax.dot_general(
                q_ref[...], x, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (qp, cap)
        ns = ns_ref[0]                                     # (1, cap)
        canon = canon_ref[0]
        want_ns = wants_ref[0]
        want_canon = wants_ref[1]
        ok = (ns != PAD_TAG)
        ok &= (want_ns < 0) | (ns == want_ns)
        ok &= (want_canon < 0) | (canon == want_canon)
        s = jnp.where(ok, s, neg_inf)                      # bcast rows

        # top-m per 128-lane bucket: m cheap minor-axis max/argmax passes
        # (minor-axis argmax lowers efficiently — see _bucketed_tile_kernel)
        s3 = s.reshape(qp, nb, _BUCKET)
        lane = jax.lax.broadcasted_iota(jnp.int32, (qp, nb, _BUCKET), 2)
        bucket_base = jax.lax.broadcasted_iota(
            jnp.int32, (qp, nb), 1) * _BUCKET
        parts_sc, parts_id = [], []
        for _ in range(m):
            bmax = jnp.max(s3, axis=2)                     # (qp, nb)
            barg = jnp.argmax(s3, axis=2).astype(jnp.int32)
            parts_sc.append(bmax)
            parts_id.append(jnp.where(jnp.isneginf(bmax), -1,
                                      bucket_base + barg))
            if len(parts_sc) < m:
                s3 = jnp.where(lane == barg[:, :, None], neg_inf, s3)
        sc_ref[0] = jnp.concatenate(parts_sc, axis=1)      # (qp, m*nb)
        id_ref[0] = jnp.concatenate(parts_id, axis=1)

    @pl.when(step >= nu_ref[0])
    def _pad():
        # padded steps re-map to the last unique list (same block index ->
        # the pipeline skips the re-fetch); their outputs are never gathered
        # (qslots always point below n_uniq) but must still be defined
        sc_ref[0] = jnp.full((qp, m * nb), neg_inf, jnp.float32)
        id_ref[0] = jnp.full((qp, m * nb), -1, jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("nprobe", "k", "bucket_m", "interpret"))
def ivf_probe_batched(q, centroids, vec_lists, scale_lists, ns_lists,
                      canon_lists, row_lists, wants, *, nprobe: int, k: int,
                      bucket_m: int = 2, interpret: bool = False):
    """Batch-shared IVF probe: same signature/candidate semantics as
    ivf_probe_pallas (each query ranked over ITS OWN nprobe nearest lists),
    but each list in the batch's probe union is DMA'd once and scored
    against the whole query batch on the MXU.  Selection is approximate:
    per-128-lane-bucket top-`bucket_m` maxima per list (exact would need k
    reduce passes per step — the epilogue-bound regime this kernel exists
    to escape).  Returns (scores (Q,k), rows (Q,k)); rows -1 where fewer
    than k candidates survive the filters.

    Requires cap % 128 == 0 (the production IVF cap policy — index/ivf.py
    aligns caps to whole TPU lane tiles).
    """
    qn, d = q.shape
    nlist, cap, _ = vec_lists.shape
    if cap % _BUCKET:
        raise ValueError(f"ivf_probe_batched: cap={cap} must be a multiple "
                         f"of {_BUCKET} (whole-lane buckets)")
    is_int8 = vec_lists.dtype == jnp.int8
    nb = cap // _BUCKET
    m = max(1, min(int(bucket_m), 4))

    sims_c = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, lists = jax.lax.top_k(sims_c, nprobe)               # (Q, nprobe)

    # dedup to a fixed-size unique-front buffer (U grid steps) and build the
    # inverse map qslots: each (query, probe) draw -> its slot in `uniq`
    v = lists.reshape(-1).astype(jnp.int32)                # (S,)
    perm = jnp.argsort(v)
    s_flat = v[perm]
    first = jnp.concatenate([jnp.ones((1,), bool),
                             s_flat[1:] != s_flat[:-1]])
    n_uniq = first.sum().astype(jnp.int32)
    slot = (jnp.cumsum(first) - 1).astype(jnp.int32)       # sorted pos -> slot
    u_max = min(qn * nprobe, nlist)
    uniq = jnp.zeros((u_max,), jnp.int32).at[slot].set(s_flat, mode="drop")
    last_uniq = jnp.take(uniq, jnp.maximum(n_uniq - 1, 0))
    uniq = jnp.where(jnp.arange(u_max) < n_uniq, uniq, last_uniq)
    qslots = (jnp.zeros((qn * nprobe,), jnp.int32)
              .at[perm].set(slot).reshape(qn, nprobe))

    qp = _round_up(max(qn, 8), 8)                          # sublane-align Q
    if is_int8:
        # quantize the queries too: int8 x int8 MXU matmul in-kernel, with
        # the (order-preserving) per-query scale applied after the merge
        from tpu_rag.ops.quant import quantize_int8_rows

        qf = jnp.zeros((qp, d), jnp.float32).at[:qn].set(
            q.astype(jnp.float32))
        q_pad, qscale = quantize_int8_rows(qf)
    else:
        q_pad = jnp.zeros((qp, d), jnp.float32).at[:qn].set(
            q.astype(jnp.float32))
        qscale = None
    scale3 = scale_lists.reshape(nlist, 1, cap)
    ns3 = ns_lists.reshape(nlist, 1, cap)
    canon3 = canon_lists.reshape(nlist, 1, cap)

    kern = functools.partial(_batched_bucket_kernel, cap=cap, qp=qp, nb=nb,
                             m=m, is_int8=is_int8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # uniq, n_uniq, wants
        grid=(u_max,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda u, uniq, nu, wants: (0, 0)),
            pl.BlockSpec((1, cap, d),
                         lambda u, uniq, nu, wants: (uniq[u], 0, 0)),
            pl.BlockSpec((1, 1, cap),
                         lambda u, uniq, nu, wants: (uniq[u], 0, 0)),
            pl.BlockSpec((1, 1, cap),
                         lambda u, uniq, nu, wants: (uniq[u], 0, 0)),
            pl.BlockSpec((1, 1, cap),
                         lambda u, uniq, nu, wants: (uniq[u], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qp, m * nb),
                         lambda u, uniq, nu, wants: (u, 0, 0)),
            pl.BlockSpec((1, qp, m * nb),
                         lambda u, uniq, nu, wants: (u, 0, 0)),
        ],
    )
    sc_l, id_l = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((u_max, qp, m * nb), jnp.float32),
                   jax.ShapeDtypeStruct((u_max, qp, m * nb), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(uniq, n_uniq.reshape(1), wants.astype(jnp.int32), q_pad, vec_lists,
      scale3, ns3, canon3)

    # per-query gather of its own nprobe lists' bucket winners: (Q, nprobe,
    # m*nb) — a few hundred KB, NOT a |union|-wide merge
    sc_t = jnp.transpose(sc_l[:, :qn], (1, 0, 2))          # (Q, U, m*nb)
    id_t = jnp.transpose(id_l[:, :qn], (1, 0, 2))
    gi = qslots[:, :, None]
    cand_sc = jnp.take_along_axis(sc_t, gi, axis=1).reshape(qn, -1)
    local = jnp.take_along_axis(id_t, gi, axis=1)          # (Q, nprobe, m*nb)
    safe_local = jnp.maximum(local, 0)
    gidx = lists[:, :, None].astype(jnp.int32) * cap + safe_local
    flat_rows = row_lists.reshape(-1)[gidx.reshape(qn, -1)]
    flat_rows = jnp.where(local.reshape(qn, -1) < 0, -1, flat_rows)

    k_out = min(k, cand_sc.shape[1])
    top_sc, pos = jax.lax.top_k(cand_sc, k_out)
    top_rows = jnp.take_along_axis(flat_rows, pos, axis=1)
    top_rows = jnp.where(jnp.isneginf(top_sc), -1, top_rows)
    if qscale is not None:
        # per-query int8 scale: positive, so -inf sentinels survive
        top_sc = top_sc * qscale[:qn, None]
    if k_out < k:
        top_sc = jnp.pad(top_sc, ((0, 0), (0, k - k_out)),
                         constant_values=-jnp.inf)
        top_rows = jnp.pad(top_rows, ((0, 0), (0, k - k_out)),
                           constant_values=-1)
    return top_sc, top_rows

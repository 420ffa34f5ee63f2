"""Fused similarity matmul + top-k selection kernels.

This is the TPU-native replacement for the reference's ANN engine (hnswlib
HNSW graph walk inside chromadb — reference api/app.py:86-91,539-566 and the
persisted graph segments under vector_store/).  Instead of a pointer-chasing
graph (hostile to the MXU), the database lives in HBM as a dense matrix and
search is a streaming fused kernel:

    for each DB tile (BN rows, pipelined HBM->VMEM by the Pallas grid):
        scores = Q @ tile.T          # MXU, bf16 x bf16 -> f32 accumulate
        mask   = metadata filter     # VPU, in-kernel (namespace/canonicality)
        local top-k of the tile      # VPU, k passes of max+mask
    exact global top-k = top-k over the union of per-tile top-k's  # XLA

Per-tile exact top-k guarantees the global result is exact (recall 1.0): the
true global top-k is a subset of the union of per-tile top-k's.  The kernel
is HBM-bandwidth-bound by design — the only traffic is one streaming read of
the database tile (bf16 or int8), which is the speed-of-light lower bound for
exhaustive search.

The int8 path stores rows quantized with a per-row scale and rescales the
*scores* after the matmul (dot(q, x*s) == dot(q, x) * s for per-row s), so no
dequantized copy of the tile is ever materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tag value marking padded (non-existent) DB rows; real tag ids are >= 0 and
# a filter value of -1 means "no filter on this tag".
PAD_TAG = -(2**31)

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Queries per kernel invocation: the (QP, BN) f32 score buffers live in VMEM
# alongside the DB tile, so QP is capped and larger query batches are chunked
# into multiple kernel calls (the DB tile re-streams per chunk — acceptable:
# chunks of 64 queries amortize the scan well past the knee).
QP_MAX = 64


def _compiler_params():
    """Raise Mosaic's scoped-VMEM cap (default ~16 MB) so larger DB tiles
    fit double-buffered; v5e has 128 MB VMEM per core.  Measured at 10M
    rows: the pure-DMA pipeline floor is ~13.0-13.4 ms (~585 GB/s, 72% of
    the 819 GB/s nominal peak) and is flat across bn in {5376..43008}, so
    block size buys epilogue amortization, not DMA rate."""
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def default_block_n(dim: int, dtype_bytes: int, requested: int = 8192,
                    mode: str = "exact") -> int:
    """Pick a DB tile height that fits VMEM alongside the score buffers,
    rounded to a multiple of 256.

    exact: ~<=6MB for the (double-buffered) DB tile and ~4MB for the
    (QP_MAX, BN) f32 score temporaries — the k-pass selection loop keeps
    several live (QP, BN) vectors, so the score budget binds at 5376 for
    d=384 (bigger tiles measured faster monotonically up to that point:
    4096: 20ms, 5376: 14.6ms at 10M in one qp=8 run).

    bucketed: the one-pass epilogue holds ~one live (QP, BN) buffer, and
    _compiler_params() raises Mosaic's scoped-VMEM cap, so tiles can double:
    bn=10752 measured 13.7ms bf16 / 9.1ms int8 at 10M (vs 14.8/10.2 at
    5376) — 96% of the measured DMA-pipeline floor.

    packed: the packed-selection loop keeps one persistent (QP, BN) int32
    buffer plus transients — the bucketed budgets fit."""
    if mode in ("bucketed", "packed"):
        tile_budget = 12 * 1024 * 1024
        score_budget = 8 * 1024 * 1024
    else:
        tile_budget = 6 * 1024 * 1024
        score_budget = 4 * 1024 * 1024
    bn = min(requested,
             max(256, tile_budget // max(1, dim * dtype_bytes)),
             max(256, score_budget // (QP_MAX * 12)))
    if mode == "packed":
        # the packed (score|index) key reserves PACKED_IDX_BITS for the
        # within-tile index (int8 tiles would otherwise exceed it)
        bn = min(bn, PACKED_BN_MAX)
    return max(256, (bn // 256) * 256)


def _topk_tile_kernel(wants_ref, q_ref, x_ref, ns_ref, canon_ref, scale_ref,
                      qscale_ref, sc_ref, id_ref, *, k_eff: int, bn: int,
                      qp: int, kpad: int, is_int8: bool):
    i = pl.program_id(0)
    x = x_ref[:]
    # (BN, D) x (QP, D) -> (BN, QP), then transpose. With the tiny query
    # matrix as the MXU-stationary operand the DB tile streams through the
    # systolic array instead of being reloaded as weights — measured ~30%
    # faster than the (QP, D) x (BN, D) orientation at QP=8.
    if is_int8:
        # native int8 x int8 MXU matmul with int32 accumulation; both
        # per-row scales are applied to the int32 scores afterwards
        scores_t = jax.lax.dot_general(
            x, q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        scores_t = scores_t * qscale_ref[:]                 # (BN, QP) * (1, QP)
        scores = scores_t.T * scale_ref[:].reshape(1, bn)   # db row scales
    else:
        scores_t = jax.lax.dot_general(
            x, q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores_t.T  # (QP, BN)

    ns = ns_ref[:].reshape(1, bn)
    canon = canon_ref[:].reshape(1, bn)
    want_ns = wants_ref[0, 0]
    want_canon = wants_ref[0, 1]
    valid = ns != PAD_TAG
    ok = valid & ((want_ns < 0) | (ns == want_ns)) & ((want_canon < 0) | (canon == want_canon))
    neg_inf = jnp.float32(-jnp.inf)
    scores = jnp.where(ok, scores, neg_inf)

    col = jax.lax.broadcasted_iota(jnp.int32, (qp, bn), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (qp, kpad), 1)
    base = jnp.int32(i * bn)

    # k_eff is static — unroll the selection loop (no fori_loop carry of the
    # 1.4MB score buffer).  CRITICAL: no argmax.  Mosaic lowers a cross-lane
    # argmax ~40x slower than a plain max (measured ~39us vs ~1us per
    # (64, 2048) f32 tile on v5e); recovering the winner's index with an
    # equality compare + min-over-iota keeps every pass to cheap max/where
    # traversals and made the whole kernel ~70x faster than the argmax
    # version at 100K rows.  Ties: `s == m` matches every tied lane, the min
    # picks the lowest index, and the mask-out removes only that one lane —
    # same deterministic lowest-index tiebreak as jnp.argmax.
    s = scores
    sc_acc = jnp.full((qp, kpad), neg_inf, jnp.float32)
    id_acc = jnp.full((qp, kpad), -1, jnp.int32)
    big = jnp.int32(2**30)
    for j in range(k_eff):
        m = jnp.max(s, axis=1, keepdims=True)                       # (QP, 1)
        idx = jnp.min(jnp.where(s == m, col, big), axis=1, keepdims=True)
        s = jnp.where(col == idx, neg_inf, s)
        sc_acc = jnp.where(kcol == j, m, sc_acc)
        id_acc = jnp.where(kcol == j, base + idx, id_acc)
    sc_ref[0] = sc_acc
    id_ref[0] = id_acc


def _sortable_key(sbits):
    """Monotone map from f32 bit patterns to SIGNED int32 order: positive
    floats already order as ints; negative floats get their low 31 bits
    complemented (sign bit preserved, so the map is its own inverse)."""
    return sbits ^ (jax.lax.shift_right_arithmetic(sbits, 31)
                    & jnp.int32(0x7FFFFFFF))


def _bitcast32(x, dtype, *, interpret: bool):
    """Same-width bitcast inside a kernel: pltpu.bitcast is the
    Mosaic-native lowering (the pallas guide's PRNG recipes use it);
    interpret mode falls back to lax.bitcast_convert_type (the pltpu
    primitive has no CPU-interpret rule)."""
    if interpret:
        return jax.lax.bitcast_convert_type(x, dtype)
    return pltpu.bitcast(x, dtype)


#: Within-tile index bits in the packed (score|index) key.  14 bits covers
#: the packed tile cap (bn <= 16384) and leaves 18 bits of sortable score
#: (sign + 8 exponent + 9 mantissa ~ fp16-grade, 4x finer than the original
#: 16-bit layout).  Resolution is the recall-critical knob: with 16-bit keys
#: (~bf16 resolution) a clustered 100K corpus floods rank-10 with up to ~90
#: equal-key ties (measured on v5e — BENCH_r03 packed recall 0.8031 with a
#: 2k oversample); 18-bit keys cut the tie census ~4x.
PACKED_IDX_BITS = 14
PACKED_BN_MAX = 1 << PACKED_IDX_BITS


def packed_k_scan(k: int, n: int) -> int:
    """Refine oversample for packed-mode selection.  Packed ties are broken
    by lowest index, not true score, so the oversample must cover the
    equal-key tie census at rank k — measured at 100K clustered rows on
    v5e: max 90 tied keys at 16-bit resolution, ~4x fewer at the 18-bit
    layout above.  max(4k, 64) covered that census with margin (k_scan=64
    measured recall 0.9937 even at 16-bit keys; 128 measured 1.0).  The
    census scales with corpus density per score-ulp, i.e. with n — packed
    is therefore quasi-exact by design and auto-mode serving routes exact
    instead (flat.py effective_search_mode)."""
    return min(max(4 * k, 64), max(n, 1))


def _packed_tile_kernel(wants_ref, q_ref, x_ref, ns_ref, canon_ref, scale_ref,
                        qscale_ref, sc_ref, id_ref, *, k_eff: int, bn: int,
                        qp: int, kpad: int, is_int8: bool,
                        interpret: bool = False):
    """Quasi-exact selection: pack (score high bits | lane index) into ONE
    int32 so each of the k passes is a single max-reduce plus a single
    mask-out — the packed index makes the winner unique, so no eq+min index
    recovery sweep and no multi-lane tie handling (vs ~6 buffer traversals
    per pass in _topk_tile_kernel).

    The pack keeps the top 18 bits of the sortable score (sign + exponent +
    9 mantissa bits ~ fp16 resolution) and PACKED_IDX_BITS=14 bits of
    within-tile index (bn <= 16384).  Selection therefore treats scores
    equal within ~2^-10 relative as ties broken by lowest index; the
    two-stage refine (flat.py refine_k_scan with the packed_k_scan
    oversample above) re-scores the oversampled candidates in ~f32.  Tie
    flooding still grows with corpus density per score-ulp, so packed is
    quasi-exact, opt-in, and NOT the auto serving mode (BENCH_r03 measured
    recall 0.8031 at the old 16-bit/2k-oversample configuration on real
    hardware).  -inf (masked/padded lanes) reconstructs to exactly -inf
    (see the low-bit fill in the loop), so the wrapper's id -1 convention
    holds."""
    i = pl.program_id(0)
    x = x_ref[:]
    # same MXU orientation rationale as _topk_tile_kernel
    if is_int8:
        scores_t = jax.lax.dot_general(
            x, q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        scores_t = scores_t * qscale_ref[:]
        scores = scores_t.T * scale_ref[:].reshape(1, bn)
    else:
        scores_t = jax.lax.dot_general(
            x, q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores_t.T  # (QP, BN)

    ns = ns_ref[:].reshape(1, bn)
    canon = canon_ref[:].reshape(1, bn)
    want_ns = wants_ref[0, 0]
    want_canon = wants_ref[0, 1]
    ok = (ns != PAD_TAG)
    ok &= (want_ns < 0) | (ns == want_ns)
    ok &= (want_canon < 0) | (canon == want_canon)
    scores = jnp.where(ok, scores, jnp.float32(-jnp.inf))

    col = jax.lax.broadcasted_iota(jnp.int32, (qp, bn), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (qp, kpad), 1)
    base = jnp.int32(i * bn)

    key = _sortable_key(_bitcast32(scores, jnp.int32, interpret=interpret))
    idx_mask = jnp.int32(PACKED_BN_MAX - 1)   # 0x3FFF
    hi = jnp.int32(-PACKED_BN_MAX)            # 0xFFFFC000 as int32
    packed = (key & hi) | (idx_mask - col)

    neg_inf = jnp.float32(-jnp.inf)
    int_min = jnp.int32(-(2**31))
    sc_acc = jnp.full((qp, kpad), neg_inf, jnp.float32)
    id_acc = jnp.full((qp, kpad), -1, jnp.int32)
    for j in range(k_eff):
        m = jnp.max(packed, axis=1, keepdims=True)            # (QP, 1)
        packed = jnp.where(packed == m, int_min, packed)      # unique winner
        idx = idx_mask - (m & idx_mask)
        # low-bit fill before the inverse map: negative keys complement their
        # low 31 bits, so filling with ones makes the reconstructed mantissa
        # low bits zero — in particular -inf (key_hi sign+max-exponent bits)
        # comes back as exactly -inf instead of a NaN bit pattern
        fill = jnp.where(m < 0, idx_mask, jnp.int32(0))
        sc = _bitcast32(_sortable_key((m & hi) | fill), jnp.float32,
                        interpret=interpret)
        sc_acc = jnp.where(kcol == j, sc, sc_acc)
        id_acc = jnp.where(kcol == j, base + idx, id_acc)
    # a slot whose winner was a masked lane carries score -inf; normalize its
    # id to -1 here so the global merge can't resurrect it on score ties
    id_acc = jnp.where(jnp.isneginf(sc_acc), -1, id_acc)
    sc_ref[0] = sc_acc
    id_ref[0] = id_acc


def _bucketed_tile_kernel(wants_ref, q_ref, x_ref, ns_ref, canon_ref, scale_ref,
                          sc_ref, id_ref, *, bn: int, qp: int,
                          nb: int, is_int8: bool):
    """One-pass approximate variant (TPU-KNN style): per 128-lane bucket,
    keep only the max. The union of bucket maxima misses a true top-k member
    only when two of them land in the same 128-row bucket — rare for
    k << n/128 (recall measured in tests/test_ops_topk.py).

    The matmul is computed DIRECTLY in (QP, BN) orientation — queries as the
    left operand — so scores are born in the layout every epilogue op wants
    (lane-major masks/scales, minor-axis bucket max/argmax) and the
    (BN,QP)->(QP,BN) transpose relayout disappears.  A/B at 10M rows, qp=64:
    bf16 14.8 -> 13.7 ms (96% of the ~586 GB/s measured DMA-pipeline floor),
    int8 10.2 -> 9.1 ms.  (At qp=8 the opposite orientation measured faster
    — see _topk_tile_kernel.  The wrapper pads queries to a multiple of 8,
    NOT to QP_MAX: bucketed serving is the >= 2M-row regime where queries
    arrive microbatched near QP_MAX, and padding a cold single query 8x
    would buy back the relayout at 8x the MXU work.  Small-qp bucketed
    orientation is an open A/B — revisit on hardware if cold single-query
    10M+ latency ever matters.)
    The per-QUERY int8 scale is NOT applied here: a positive per-query
    factor cannot change that query's ranking, so the wrapper applies it
    once to the k winners instead of (BN, QP) times per tile."""
    i = pl.program_id(0)
    x = x_ref[:]
    if is_int8:
        scores = jax.lax.dot_general(
            q_ref[:], x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        scores = scores * scale_ref[:].reshape(1, bn)        # per-row scale
    else:
        scores = jax.lax.dot_general(
            q_ref[:], x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (QP, BN)

    ns = ns_ref[:].reshape(1, bn)
    canon = canon_ref[:].reshape(1, bn)
    want_ns = wants_ref[0, 0]
    want_canon = wants_ref[0, 1]
    ok = (ns != PAD_TAG)
    ok &= (want_ns < 0) | (ns == want_ns)
    ok &= (want_canon < 0) | (canon == want_canon)
    scores = jnp.where(ok, scores, jnp.float32(-jnp.inf))

    s3 = scores.reshape(qp, nb, 128)
    bmax = jnp.max(s3, axis=2)                                   # (QP, NB)
    # argmax here is over the MINOR (128-lane) axis, which Mosaic lowers
    # efficiently (A/B at 10M rows: 14.0 ms vs 19.6 ms for the eq+min
    # recovery).  Only a LONG-axis argmax is pathological (~40x slower than
    # max — see _topk_tile_kernel, which must avoid it).
    barg = jnp.argmax(s3, axis=2).astype(jnp.int32)              # (QP, NB)
    bucket_base = jax.lax.broadcasted_iota(jnp.int32, (qp, nb), 1) * 128
    sc_ref[0] = bmax
    id_ref[0] = jnp.int32(i * bn) + bucket_base + barg


@functools.partial(
    jax.jit,
    static_argnames=("k", "is_int8", "interpret", "qp", "nt", "bn"),
)
def _bucketed_topk_padded(q_pad, x_pad, ns_pad, canon_pad, scale_pad, qscale_pad,
                          wants, *, k: int, is_int8: bool, interpret: bool,
                          qp: int, nt: int, bn: int):
    nb = bn // 128
    kern = functools.partial(
        _bucketed_tile_kernel, bn=bn, qp=qp, nb=nb, is_int8=is_int8,
    )
    d = q_pad.shape[1]
    grid_spec = pl.GridSpec(
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, qp, nb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp, nb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    dtype_bytes = 1 if is_int8 else x_pad.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * qp * d * nt * bn,
        bytes_accessed=nt * bn * d * dtype_bytes + qp * d * 4 + 2 * nt * qp * nb * 4,
        transcendentals=0,
    )
    sc, ids = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nt, qp, nb), jnp.float32),
            jax.ShapeDtypeStruct((nt, qp, nb), jnp.int32),
        ),
        cost_estimate=cost,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(wants, q_pad, x_pad, ns_pad.reshape(nt, 1, bn), canon_pad.reshape(nt, 1, bn),
      scale_pad.reshape(nt, 1, bn))
    cand_sc = sc.transpose(1, 0, 2).reshape(qp, nt * nb)
    cand_id = ids.transpose(1, 0, 2).reshape(qp, nt * nb)
    # tiny corpus under EXPLICIT bucketed mode can have fewer bucket-maxima
    # candidates than k: clamp and pad with -inf/-1 like every other mode
    # instead of letting lax.top_k raise
    k_eff = min(k, cand_sc.shape[1])
    top_sc, pos = jax.lax.top_k(cand_sc, k_eff)
    top_id = jnp.take_along_axis(cand_id, pos, axis=1)
    top_id = jnp.where(jnp.isneginf(top_sc), -1, top_id)
    if k_eff < k:
        top_sc = jnp.pad(top_sc, ((0, 0), (0, k - k_eff)),
                         constant_values=-jnp.inf)
        top_id = jnp.pad(top_id, ((0, 0), (0, k - k_eff)),
                         constant_values=-1)
    if is_int8:
        # per-query scale deferred out of the kernel (ranking-invariant);
        # -inf winners stay -inf (qscale > 0 by construction)
        top_sc = top_sc * qscale_pad.reshape(qp, 1)
    return top_sc, top_id


@functools.partial(
    jax.jit,
    static_argnames=("k", "is_int8", "interpret", "qp", "nt", "bn", "packed"),
)
def _fused_topk_padded(q_pad, x_pad, ns_pad, canon_pad, scale_pad, qscale_pad,
                       wants, *, k: int, is_int8: bool, interpret: bool,
                       qp: int, nt: int, bn: int, packed: bool = False):
    kpad = _round_up(max(k, 1), _LANE)
    if packed and bn > PACKED_BN_MAX:
        raise ValueError(
            f"packed selection needs bn <= {PACKED_BN_MAX} "
            f"({PACKED_IDX_BITS} index bits)")
    if packed:
        kern = functools.partial(
            _packed_tile_kernel, k_eff=k, bn=bn, qp=qp, kpad=kpad,
            is_int8=is_int8, interpret=interpret)
    else:
        kern = functools.partial(
            _topk_tile_kernel, k_eff=k, bn=bn, qp=qp, kpad=kpad,
            is_int8=is_int8)
    d = q_pad.shape[1]
    grid_spec = pl.GridSpec(
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, qp, kpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp, kpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    dtype_bytes = 1 if is_int8 else x_pad.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * qp * d * nt * bn,
        bytes_accessed=nt * bn * d * dtype_bytes + qp * d * 4 + 2 * nt * qp * kpad * 4,
        transcendentals=0,
    )
    sc, ids = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nt, qp, kpad), jnp.float32),
            jax.ShapeDtypeStruct((nt, qp, kpad), jnp.int32),
        ),
        cost_estimate=cost,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(wants, q_pad, x_pad, ns_pad.reshape(nt, 1, bn), canon_pad.reshape(nt, 1, bn),
      scale_pad.reshape(nt, 1, bn), qscale_pad.reshape(1, qp))
    # Union of per-tile exact top-k -> exact global top-k.
    cand_sc = sc[:, :, :k].transpose(1, 0, 2).reshape(qp, nt * k)
    cand_id = ids[:, :, :k].transpose(1, 0, 2).reshape(qp, nt * k)
    top_sc, pos = jax.lax.top_k(cand_sc, k)
    top_id = jnp.take_along_axis(cand_id, pos, axis=1)
    # slots with no finite candidate (fewer than k filter matches) get id -1,
    # consistent with topk_xla_reference and the bucketed mode
    top_id = jnp.where(jnp.isneginf(top_sc), -1, top_id)
    return top_sc, top_id


def fused_matmul_topk(
    queries,
    database,
    k: int,
    *,
    db_scales=None,
    ns_tags=None,
    canon_tags=None,
    want_ns: int = -1,
    want_canon: int = -1,
    block_n: int = 2048,
    interpret: bool | None = None,
    assume_padded: bool = False,
    wants=None,
    mode: str = "exact",
):
    """Top-k inner-product search: returns (scores (q,k) f32, ids (q,k) i32).

    mode="exact": per-tile exact top-k (k passes) -> exact global top-k.
    mode="packed": per-tile top-k at ~fp16 score resolution (packed
      score|index selection — one max-reduce per pass instead of three
      sweeps); exact up to score ties within ~2^-10 relative, broken by
      lowest index.  Tie flooding scales with corpus density per
      score-ulp, so callers MUST oversample (packed_k_scan) and re-score
      in f32; quasi-exact, opt-in — auto-mode serving uses "exact"
      instead (measured on v5e: 16-bit keys + 2k oversample lost 20%
      recall@10 on a clustered 100K corpus).
    mode="bucketed": one-pass per-128-row-bucket maxima -> approximate
      (recall ~>0.99 for k << n/128); much less VPU work per tile.
      Requires n >> 128*k — with fewer rows there are fewer candidates
      than k (per-shard n when used under shard_map).

    Pass `wants` as a pre-existing (1, 2) int32 DEVICE array to avoid a
    host->device transfer per call (transfers are expensive on tunneled
    backends); it overrides want_ns/want_canon.

    queries:   (q, d) float32/bfloat16
    database:  (n, d) float32/bfloat16, or int8 with db_scales (n,) float32
    ns_tags / canon_tags: optional (n,) int32 metadata tag ids (>= 0);
      want_ns / want_canon filter to rows with the matching tag (-1 = no filter).
      This implements the reference's `where={namespace, canonicality}` Chroma
      filter (reference api/app.py:556-559) inside the kernel.
    ids of -1 (score -inf) mean "fewer than k rows matched".
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n, d = database.shape
    q = queries.shape[0]
    is_int8 = database.dtype == jnp.int8
    dtype_bytes = 1 if is_int8 else database.dtype.itemsize
    bn = default_block_n(d, dtype_bytes, block_n, mode=mode)
    nt = max(1, -(-n // bn))
    n_pad = nt * bn

    # stack (not jnp.array) so want_ns/want_canon may be traced scalars,
    # e.g. when called inside shard_map (tpu_rag/parallel/sharded.py)
    if wants is None:
        wants = jnp.stack([
            jnp.asarray(want_ns, jnp.int32),
            jnp.asarray(want_canon, jnp.int32),
        ]).reshape(1, 2)
    if ns_tags is None or canon_tags is None:
        # a filter on a tag array that does not exist cannot be evaluated:
        # ignore it (the topk_xla_reference semantics) — pad_tags below
        # fills real rows with tag 0, which would otherwise silently match
        # nothing.  Works for traced wants too (host-known mask).
        keep = jnp.asarray([[ns_tags is not None, canon_tags is not None]])
        wants = jnp.where(keep, wants, jnp.int32(-1))

    if assume_padded:
        # caller guarantees: n % bn == 0, tags/scales are full-length with
        # PAD_TAG already in padding rows (see FlatIndex._compact)
        x_pad, ns_pad, canon_pad, scale_pad = database, ns_tags, canon_tags, db_scales
        if scale_pad is None:
            scale_pad = jnp.ones((n_pad,), jnp.float32)
    else:
        x_pad = database
        if n_pad != n:
            x_pad = jnp.zeros((n_pad, d), database.dtype).at[:n].set(database)

        def pad_tags(t, fill_real):
            if t is None:
                t = jnp.full((n,), fill_real, jnp.int32)
            out = jnp.full((n_pad,), PAD_TAG, jnp.int32)
            return out.at[:n].set(t.astype(jnp.int32))

        ns_pad = pad_tags(ns_tags, 0)
        canon_pad = pad_tags(canon_tags, 0)
        if db_scales is None:
            scale_pad = jnp.ones((n_pad,), jnp.float32)
        else:
            scale_pad = jnp.zeros((n_pad,), jnp.float32).at[:n].set(db_scales.astype(jnp.float32))

    if q > QP_MAX:
        # chunk large query batches: VMEM holds at most QP_MAX queries' score
        # buffers per kernel call (static python loop — fine under jit).
        # Recurse on the ALREADY-padded arrays (assume_padded=True) so the
        # database/tags/scales padding above isn't rebuilt once per chunk.
        parts = [fused_matmul_topk(
            queries[i:i + QP_MAX], x_pad, k, db_scales=scale_pad,
            ns_tags=ns_pad, canon_tags=canon_pad, block_n=block_n,
            interpret=interpret, assume_padded=True, wants=wants, mode=mode)
            for i in range(0, q, QP_MAX)]
        return (jnp.concatenate([p[0] for p in parts], axis=0),
                jnp.concatenate([p[1] for p in parts], axis=0))
    qp = _round_up(max(q, 8), 8)

    if is_int8:
        # quantize the queries too: int8 x int8 MXU matmul with int32
        # accumulation, both per-row scales applied to the scores in-kernel
        from tpu_rag.ops.quant import quantize_int8_rows

        qf = jnp.zeros((qp, d), jnp.float32).at[:q].set(queries.astype(jnp.float32))
        q_pad, qscale_pad = quantize_int8_rows(qf)
    else:
        compute_dtype = jnp.bfloat16 if database.dtype == jnp.bfloat16 else database.dtype
        if q == qp and queries.dtype == compute_dtype:
            q_pad = queries
        else:
            q_pad = jnp.zeros((qp, d), compute_dtype).at[:q].set(queries.astype(compute_dtype))
        qscale_pad = jnp.ones((qp,), jnp.float32)

    if mode == "bucketed":
        top_sc, top_id = _bucketed_topk_padded(
            q_pad, x_pad, ns_pad, canon_pad, scale_pad, qscale_pad, wants,
            k=int(k), is_int8=is_int8, interpret=bool(interpret),
            qp=qp, nt=nt, bn=bn)
    else:
        top_sc, top_id = _fused_topk_padded(
            q_pad, x_pad, ns_pad, canon_pad, scale_pad, qscale_pad, wants,
            k=int(k), is_int8=is_int8, interpret=bool(interpret),
            qp=qp, nt=nt, bn=bn, packed=(mode == "packed"))
    return top_sc[:q], top_id[:q]


def _stream_only_kernel(x_ref, out_ref):
    # one cheap VPU reduce per tile so the DMA cannot be elided; each step
    # writes its own output block (no cross-step dependency to serialize
    # the pipeline).  The block is (1, 8, D) — a (1, LANE) row would
    # violate Mosaic's block-shape rule (second-to-last dim must be
    # divisible by 8 or equal the array dim; this was the r3 scale_10m
    # crash), and a (D,) -> (D//LANE, LANE) reshape is an unsupported
    # Mosaic shape cast — so the (1, D) sublane reduce is broadcast
    # across 8 sublanes unreshaped.
    col = jnp.sum(x_ref[:].astype(jnp.float32), axis=0, keepdims=True)
    out_ref[:] = jnp.broadcast_to(col[None], (1, 8, col.shape[1]))


@functools.partial(jax.jit, static_argnames=("bn", "interpret"))
def dma_floor_scan(x_pad, *, bn: int, interpret: bool = False):
    """Pure-streaming baseline for the fused scan kernels: identical grid
    and DB-tile BlockSpec, but the only per-tile work is a VPU reduce — it
    measures the achievable HBM->VMEM pipeline rate for this exact access
    pattern.  kernel_gbps / dma_floor_gbps is the honest speed-of-light
    fraction: the v5e 819 GB/s spec number is NOT reachable by a single
    core's DMA pipeline (measured floor ~585 GB/s at 10Mx384 bf16), so a
    scan at ~95% of the measured floor IS at speed of light even though it
    reads ~70% of nominal peak."""
    n_pad, d = x_pad.shape
    nt = n_pad // bn
    out = pl.pallas_call(
        _stream_only_kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec((bn, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, 8, d), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_pad)
    # each tile's reduce is replicated over 8 sublanes — divide it back out
    return jnp.sum(out) / 8.0


def topk_xla_reference(
    queries,
    database,
    k: int,
    *,
    db_scales=None,
    ns_tags=None,
    canon_tags=None,
    want_ns: int = -1,
    want_canon: int = -1,
):
    """Pure-XLA exhaustive search (no Pallas). Used as the CPU serving path
    and as ground truth in tests."""
    x = database
    if x.dtype == jnp.int8:
        # rescale the scores, not the matrix: dot(q, x*s) == dot(q, x) * s
        # for per-row s — avoids materializing a dequantized f32 copy
        scores = jnp.dot(queries.astype(jnp.float32), x.astype(jnp.bfloat16).astype(jnp.float32).T)
        if db_scales is None:  # match fused_matmul_topk: unit scales
            db_scales = jnp.ones((x.shape[0],), jnp.float32)
        scores = scores * db_scales[None, :].astype(jnp.float32)
    else:
        scores = jnp.dot(queries.astype(jnp.float32), x.astype(jnp.float32).T)
    n = database.shape[0]
    ok = jnp.ones((n,), bool)
    # wants may be traced scalars; keep the masking dynamic (no python `if`
    # on their values) so this is usable inside shard_map.
    if ns_tags is not None:
        want_ns = jnp.asarray(want_ns, jnp.int32)
        ok = ok & (ns_tags != PAD_TAG)  # exclude pre-padded rows
        ok = ok & ((want_ns < 0) | (ns_tags == want_ns))
    if canon_tags is not None:
        want_canon = jnp.asarray(want_canon, jnp.int32)
        ok = ok & ((want_canon < 0) | (canon_tags == want_canon))
    scores = jnp.where(ok[None, :], scores, -jnp.inf)
    k_eff = min(k, n)
    top_sc, top_id = jax.lax.top_k(scores, k_eff)
    if k_eff < k:
        pad = k - k_eff
        top_sc = jnp.pad(top_sc, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        top_id = jnp.pad(top_id, ((0, 0), (0, pad)), constant_values=-1)
    top_id = jnp.where(jnp.isneginf(top_sc), -1, top_id)
    return top_sc, top_id.astype(jnp.int32)

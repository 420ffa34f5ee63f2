"""Pallas IVF probe kernel: scalar-prefetch gather + fused scoring.

The XLA probe path (tpu_rag/index/ivf.py _probe_impl) materializes the
gathered candidates (Q, nprobe, cap, d) in HBM before the einsum — at
nprobe=64, cap=768, d=384 that's ~3GB of gather traffic for an 8-query
batch.  This kernel instead uses PrefetchScalarGridSpec: the selected list
ids are prefetched scalars, and each grid step DMAs exactly one (cap, d)
list block straight into VMEM, scores it against its query on the MXU, and
writes only the (cap,) masked scores.  Traffic drops to the bytes actually
scored (nprobe * cap * d per query), read once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_rag.ops.topk import PAD_TAG


def _probe_kernel(lists_ref, wants_ref, q_ref, vec_ref, scale_ref, ns_ref,
                  canon_ref, out_ref, *, cap: int, is_int8: bool):
    # f32 operands: Mosaic rejects bf16 matvec with f32 accumulation here
    # (vector.broadcast verification error); the upcast happens in VMEM
    x = vec_ref[0].astype(jnp.float32)              # (cap, d)
    qv = q_ref[0].astype(jnp.float32)               # (1, d) — this step's query
    s = jax.lax.dot_general(
        x, qv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).T                                             # (1, cap)
    if is_int8:
        s = s * scale_ref[0]                        # (1, cap)
    ns = ns_ref[0]                                  # (1, cap)
    canon = canon_ref[0]                            # (1, cap)
    want_ns = wants_ref[0]
    want_canon = wants_ref[1]
    ok = (ns != PAD_TAG)
    ok &= (want_ns < 0) | (ns == want_ns)
    ok &= (want_canon < 0) | (canon == want_canon)
    out_ref[0, 0] = jnp.where(ok, s, jnp.float32(-jnp.inf))


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "interpret"))
def ivf_probe_pallas(q, centroids, vec_lists, scale_lists, ns_lists,
                     canon_lists, row_lists, wants, *, nprobe: int, k: int,
                     interpret: bool = False):
    """Same contract as ivf._probe_impl: returns (scores (Q,k), live rows (Q,k)).

    q: (Q, d) f32; vec_lists: (nlist, cap, d); wants: (2,) int32.
    """
    qn, d = q.shape
    nlist, cap, _ = vec_lists.shape
    is_int8 = vec_lists.dtype == jnp.int8

    sims_c = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, lists = jax.lax.top_k(sims_c, nprobe)           # (Q, nprobe)
    lists_flat = lists.reshape(-1).astype(jnp.int32)   # scalar prefetch

    # int8 lists keep the QUERIES in f32: the kernel upcasts both operands to
    # f32 anyway, so a bf16 hop would only truncate ~2^-8 query precision and
    # diverge from _probe_impl on near-ties (q is tiny — no DMA savings)
    compute_dtype = (jnp.bfloat16 if vec_lists.dtype == jnp.bfloat16
                     else jnp.float32 if is_int8 else vec_lists.dtype)
    # singleton middle axis: (1, 1, d) query blocks indexed by the grid
    # (dynamic in-kernel row slices can't be proven sublane-aligned)
    q3 = q.astype(compute_dtype).reshape(qn, 1, d)
    # singleton middle axis so (1, 1, cap) blocks satisfy the (sublane, lane)
    # tiling rules (second-to-last block dim == full array dim 1)
    scale3 = scale_lists.reshape(nlist, 1, cap)
    ns3 = ns_lists.reshape(nlist, 1, cap)
    canon3 = canon_lists.reshape(nlist, 1, cap)

    kern = functools.partial(_probe_kernel, cap=cap, is_int8=is_int8)
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
        out_specs=pl.BlockSpec((1, 1, 1, cap),
                               lambda qi, pi, lists, wants: (qi, pi, 0, 0)),
    )
    scores = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qn, nprobe, 1, cap), jnp.float32),
        interpret=interpret,
    )(lists_flat, wants.astype(jnp.int32), q3, vec_lists, scale3,
      ns3, canon3)
    scores = scores.reshape(qn, nprobe, cap)

    flat_scores = scores.reshape(qn, nprobe * cap)
    flat_rows = row_lists[lists].reshape(qn, nprobe * cap)
    k_eff = min(k, nprobe * cap)
    top_sc, pos = jax.lax.top_k(flat_scores, k_eff)
    top_rows = jnp.take_along_axis(flat_rows, pos, axis=1)
    top_rows = jnp.where(jnp.isneginf(top_sc), -1, top_rows)
    return top_sc, top_rows

"""Device-side IVF list construction.

Builds the padded inverted lists on device from the same array k-means ran
on, so the corpus is uploaded exactly once per rebuild (the previous
host-side grouping re-uploaded the grouped lists — ~GBs at 1M+ rows).

group_lists: stable-sort rows by cluster assignment, compute each row's slot
(rank within its cluster), scatter rows with slot < cap into the padded
(nlist, cap, ...) arrays; rows with slot >= cap are reported back via the
`fits`/`order` outputs so the caller can route them to the exact overflow
buffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_rag.ops.topk import PAD_TAG


@functools.partial(jax.jit, static_argnames=("nlist", "cap"))
def group_lists(x, ns, canon, live_rows, assign, *, nlist: int, cap: int):
    """x: (n, d); ns/canon: (n,) i32; live_rows: (n,) i32 (live-row positions);
    assign: (n,) i32 cluster ids in [0, nlist).

    Returns (vec_lists (nlist, cap, d), ns_lists, canon_lists, row_lists,
    order (n,) i32, fits (n,) bool) — order/fits describe, in sorted order,
    which input rows landed in lists.
    """
    n = x.shape[0]
    order = jnp.argsort(assign, stable=True)
    sorted_assign = assign[order]
    starts = jnp.searchsorted(sorted_assign, jnp.arange(nlist))
    slots = jnp.arange(n, dtype=jnp.int32) - starts[sorted_assign].astype(jnp.int32)
    fits = slots < cap
    # overflow rows scatter into a sacrificial extra list (index nlist)
    li = jnp.where(fits, sorted_assign, nlist)
    si = jnp.where(fits, slots, 0)

    vec_lists = jnp.zeros((nlist + 1, cap, x.shape[1]), x.dtype)
    vec_lists = vec_lists.at[li, si].set(x[order])[:nlist]
    ns_lists = jnp.full((nlist + 1, cap), PAD_TAG, jnp.int32)
    ns_lists = ns_lists.at[li, si].set(ns[order])[:nlist]
    canon_lists = jnp.full((nlist + 1, cap), PAD_TAG, jnp.int32)
    canon_lists = canon_lists.at[li, si].set(canon[order])[:nlist]
    row_lists = jnp.full((nlist + 1, cap), -1, jnp.int32)
    row_lists = row_lists.at[li, si].set(live_rows[order])[:nlist]
    return vec_lists, ns_lists, canon_lists, row_lists, order.astype(jnp.int32), fits

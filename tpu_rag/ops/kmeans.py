"""On-device k-means (Lloyd) for IVF index build.

Replaces nothing in the reference (hnswlib builds a graph incrementally);
this is the TPU-native coarse quantizer for IVFIndex.  All iterations run
under jit on device: assignment is a dense matmul + argmax (MXU-friendly),
the centroid update is an unsorted segment-sum.  Empty clusters are re-seeded
from the rows assigned to the largest cluster.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_clusters(x, centroids, *, chunk: int = 16384):
    """argmax_j <x_i, c_j> computed in row chunks to bound memory.
    x: (n, d), centroids: (nlist, d) -> (n,) int32."""
    n = x.shape[0]
    nchunks = max(1, -(-n // chunk))
    pad = nchunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0))).reshape(nchunks, chunk, -1)

    def body(xc):
        scores = jnp.dot(xc, centroids.T, preferred_element_type=jnp.float32)
        return jnp.argmax(scores, axis=1).astype(jnp.int32)

    out = jax.lax.map(body, xp).reshape(-1)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("nlist",))
def _update_centroids(x, assign, *, nlist: int):
    sums = jax.ops.segment_sum(x, assign, num_segments=nlist)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), assign, num_segments=nlist)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    # normalize (cosine geometry: spherical k-means)
    norms = jnp.linalg.norm(centroids, axis=1, keepdims=True)
    centroids = centroids / jnp.maximum(norms, 1e-12)
    return centroids, counts


def kmeans(
    x: np.ndarray | jnp.ndarray,
    nlist: int,
    *,
    iters: int = 15,
    seed: int = 0,
    chunk: int = 16384,
):
    """Spherical k-means. Returns (centroids (nlist, d) f32, assign (n,) i32).

    x must be L2-normalized rows (FlatIndex/IVFIndex normalize at add time).
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    nlist = min(nlist, n)
    key = jax.random.PRNGKey(seed)
    init_rows = jax.random.choice(key, n, shape=(nlist,), replace=False)
    centroids = x[init_rows]

    assign = None
    for it in range(iters):
        assign = assign_clusters(x, centroids, chunk=chunk)
        centroids, counts = _update_centroids(x, assign, nlist=nlist)
        # Re-seed empty clusters from random rows (host-side decision, cheap).
        counts_np = np.asarray(counts)
        empty = np.flatnonzero(counts_np < 0.5)
        if len(empty):
            key, sub = jax.random.split(key)
            repl = jax.random.choice(sub, n, shape=(len(empty),), replace=False)
            centroids = centroids.at[jnp.asarray(empty)].set(x[repl])
    assign = assign_clusters(x, centroids, chunk=chunk)
    return np.asarray(centroids), np.asarray(assign)

"""Int8 row quantization for index shards.

Symmetric per-row int8: row_scale = max|row| / 127; values = round(row/scale).
Halves/quarters HBM traffic vs bf16/f32 for the exhaustive-search kernel
(which is bandwidth-bound), at ~1e-2 relative score error — recall impact is
measured in tests/test_index.py against exact search.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def quantize_int8_rows(x):
    """x: (n, d) float -> (values int8 (n, d), scales float32 (n,))."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scales[:, None]), -127, 127)
    return q.astype(jnp.int8), scales.astype(jnp.float32)


@jax.jit
def dequantize_int8_rows(values, scales):
    return values.astype(jnp.float32) * scales[:, None].astype(jnp.float32)

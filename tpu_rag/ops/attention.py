"""Fused multi-head self-attention kernel for the encoder forward.

TPU-native replacement for the unfused XLA attention inside the Flax
encoder (the reference runs its torch sentence-transformers encoders on
CPU — reference api/app.py:90 bi-encoder, api/app.py:95-104 cross-encoder;
this repo's trunk is tpu_rag/models/bert.py).

Why a kernel: XLA cannot fuse matmul -> softmax -> matmul, so the
(B, H, T, T) score tensor round-trips HBM twice per layer.  At the ingest
bench's device-resident shape (B=256, H=12, T=256) that is ~1.6 GB of HBM
traffic per layer — 2.3 ms at the measured ~700 GB/s — while ALL the
layer's matmuls at speed-of-light cost ~1.1 ms (BENCH_r04 encoder_ingest
mfu_device 0.2783: the score traffic, not the MXU, bounds the forward).

Encoder sequences are short (T <= 512), so the whole (T, T) score tile of
one head fits VMEM (512^2 f32 = 1 MB) and no online/streaming softmax is
needed: each grid step loads q/k/v slabs for `hb` heads of one batch item,
computes scores on the MXU, masks + softmaxes in f32 on the VPU, applies
the probabilities to V on the MXU, and writes the (hb, T, D) output — the
score tensor never exists in HBM.

Padding is masked on the KEY side only (pad queries produce garbage rows
that the callers' masked mean-pool / CLS pooling already drops; pad KEYS
would corrupt real rows and are excluded here exactly like the additive
-1e30 bias in the XLA fallback path).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -1e30


def _mha_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, hb: int,
                scale: float):
    """One grid step: `hb` heads of one batch item, full sequence."""
    kvm = mask_ref[0] > 0                                # (1, T) key mask
    for h in range(hb):                                  # static unroll
        q = q_ref[h]                                     # (T, D)
        s = jax.lax.dot_general(
            q, k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (T, T) f32
        s = jnp.where(kvm, s, _MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (T, D) f32
        o_ref[h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads_per_step", "interpret"))
def fused_mha(q, k, v, mask, *, heads_per_step: int = 0,
              interpret: bool = False):
    """Fused self-attention: q/k/v (B, T, H, D) -> (B, T, H, D).

    `mask` is the (B, T) token mask (nonzero = real token); scaling is the
    standard 1/sqrt(D) applied to the f32 scores (the XLA path scales q in
    compute dtype — doing it after the dot in f32 is strictly more
    accurate).  `heads_per_step` groups heads per grid step to amortize
    per-step overhead; it must divide H (0 = min(4, H), falling back to 1).
    """
    b, t, h, d = q.shape
    hb = heads_per_step or min(4, h)
    if h % hb != 0:
        hb = 1
    scale = 1.0 / math.sqrt(d)

    # (B, T, H, D) -> (B*H, T, D): each program's slabs are contiguous
    def bhtd(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    grid = (b * h // hb,)
    gh = h // hb  # head-groups per batch item (for the mask index map)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, hb=hb, scale=scale),
        grid=grid,
        in_specs=[
            # (B, 1, T): the trailing (1, T) block equals the array's
            # trailing dims — TPU lowering requires trailing block dims be
            # (8, 128)-divisible OR exactly the array dims (a (1, T) block
            # of a (B, T) array is neither; caught live on v5e)
            pl.BlockSpec((1, 1, t), lambda g: (g // gh, 0, 0)),  # mask
            pl.BlockSpec((hb, t, d), lambda g: (g, 0, 0)),     # q
            pl.BlockSpec((hb, t, d), lambda g: (g, 0, 0)),     # k
            pl.BlockSpec((hb, t, d), lambda g: (g, 0, 0)),     # v
        ],
        out_specs=pl.BlockSpec((hb, t, d), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(mask.astype(jnp.int32)[:, None, :], bhtd(q), bhtd(k), bhtd(v))
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)

"""Flax BERT-family transformer trunk (MiniLM / bge compatible).

TPU-native replacement for the torch sentence-transformers forward pass the
reference runs on CPU (reference api/app.py:90 for the bi-encoder,
api/app.py:95-104 for the cross-encoder).  Post-LayerNorm BERT so pretrained
HuggingFace MiniLM/bge weights map 1:1 (tpu_rag/models/hf_import.py).

Compute dtype is bf16 on TPU (MXU-native); params stay f32.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BertSpec:
    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    ffn: int = 1536
    max_len: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12


class SelfAttention(nn.Module):
    """Multi-head self-attention with a fused-kernel fast path.

    The param tree (query/key/value/out DenseGenerals) is byte-identical to
    flax.linen.MultiHeadDotProductAttention's, so every existing checkpoint
    (HF imports, orbax trained ckpts) loads unchanged.  With flash=True the
    scores+softmax+apply run inside ONE Pallas kernel (ops/attention.py) —
    the (B, H, T, T) score tensor never reaches HBM, which is what bounded
    the serving forward at mfu_device 0.28 (BENCH_r04 encoder_ingest).
    flash=False (the default, and all training paths — the kernel defines
    no VJP) is the original XLA attention, numerics unchanged."""

    spec: BertSpec
    dtype: jnp.dtype = jnp.float32
    flash: bool = False

    @nn.compact
    def __call__(self, x, mask, attn_mask):
        s = self.spec
        head_dim = s.hidden // s.heads
        proj = {"features": (s.heads, head_dim), "axis": -1,
                "dtype": self.dtype}
        q = nn.DenseGeneral(**proj, name="query")(x)
        k = nn.DenseGeneral(**proj, name="key")(x)
        v = nn.DenseGeneral(**proj, name="value")(x)
        t = x.shape[1]
        # the kernel wins when the (T, T) score tile is big enough that its
        # HBM round-trip dominates; tiny buckets keep the XLA path.  On
        # non-TPU backends it runs in interpret mode (tests force flash=True
        # on CPU for parity coverage; serving only sets it on TPU).
        if self.flash and t >= 128:
            from tpu_rag.ops.attention import fused_mha

            o = fused_mha(q, k, v, mask,
                          interpret=jax.default_backend() != "tpu")
        else:
            o = nn.dot_product_attention(q, k, v, mask=attn_mask,
                                         dtype=self.dtype)
        return nn.DenseGeneral(s.hidden, axis=(-2, -1), dtype=self.dtype,
                               name="out")(o)


class BertLayer(nn.Module):
    spec: BertSpec
    dtype: jnp.dtype = jnp.float32
    flash: bool = False

    @nn.compact
    def __call__(self, x, mask, attn_mask):
        s = self.spec
        attn = SelfAttention(s, dtype=self.dtype, flash=self.flash,
                             name="attention")(x, mask, attn_mask)
        x = nn.LayerNorm(epsilon=s.ln_eps, dtype=self.dtype, name="attention_ln")(x + attn)
        h = nn.Dense(s.ffn, dtype=self.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(s.hidden, dtype=self.dtype, name="output")(h)
        x = nn.LayerNorm(epsilon=s.ln_eps, dtype=self.dtype, name="output_ln")(x + h)
        return x


class BertEncoder(nn.Module):
    """Returns final hidden states (B, T, H). Pooling lives in the heads.

    remat=True rematerializes each layer in the backward pass (training
    memory/FLOPs trade — jax.checkpoint via nn.remat).  flash=True routes
    attention through the fused Pallas kernel (serving-only: no VJP)."""

    spec: BertSpec
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    flash: bool = False

    @nn.compact
    def __call__(self, ids, mask, type_ids=None):
        s = self.spec
        b, t = ids.shape
        if type_ids is None:
            type_ids = jnp.zeros_like(ids)
        word = nn.Embed(s.vocab_size, s.hidden, dtype=self.dtype, name="word_embeddings")(ids)
        pos_ids = jnp.arange(t, dtype=jnp.int32)[None, :]
        pos = nn.Embed(s.max_len, s.hidden, dtype=self.dtype, name="position_embeddings")(pos_ids)
        typ = nn.Embed(s.type_vocab, s.hidden, dtype=self.dtype, name="token_type_embeddings")(type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=s.ln_eps, dtype=self.dtype, name="embeddings_ln")(x)

        flash = self.flash and t >= 128
        # (B, 1, T, T) additive-free boolean attention mask — only built for
        # the XLA path; the fused kernel derives its key mask from (B, T)
        attn_mask = (None if flash else
                     (mask[:, None, None, :] > 0) & (mask[:, None, :, None] > 0))
        layer_cls = nn.remat(BertLayer) if self.remat else BertLayer
        for i in range(s.layers):
            x = layer_cls(s, dtype=self.dtype, flash=flash,
                          name=f"layer_{i}")(x, mask, attn_mask)
        return x


def spec_from_params(params, base: BertSpec) -> BertSpec:
    """Derive the architecture from a restored param tree.  A checkpoint
    knows its own shapes; serving must match them rather than the
    name-derived defaults (e.g. a ckpt trained at max_len=128 must not be
    applied under a max_len=512 module — Flax raises ScopeParamShapeError
    and retrieval silently degrades to keyword-only)."""
    from dataclasses import replace

    try:
        vocab, hidden = params["word_embeddings"]["embedding"].shape
        max_len = params["position_embeddings"]["embedding"].shape[0]
        type_vocab = params["token_type_embeddings"]["embedding"].shape[0]
        layers = sum(1 for k in params if str(k).startswith("layer_"))
        ffn = params["layer_0"]["intermediate"]["kernel"].shape[1]
        heads = params["layer_0"]["attention"]["query"]["kernel"].shape[1]
        return replace(base, vocab_size=int(vocab), hidden=int(hidden),
                       max_len=int(max_len), type_vocab=int(type_vocab),
                       layers=int(layers), ffn=int(ffn), heads=int(heads))
    except (KeyError, AttributeError, ValueError, TypeError):
        return base


def param_partition_spec(path: tuple, leaf):
    """Tensor-parallel rules for BertEncoder params: shard the FFN hidden
    dim and the attention heads over a mesh "model" axis.  Used by both the
    trainer (tpu_rag/train/contrastive.py) and TP serving (BiEncoder with a
    mesh that has a model axis).  Embeddings, LayerNorms and 1-d biases are
    replicated — they are tiny next to the sharded matmuls."""
    from jax.sharding import PartitionSpec as P

    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    if "intermediate" in joined and joined.endswith("kernel"):
        return P(None, "model")          # (H, F) -> F sharded
    if joined.endswith("output/kernel") and "attention" not in joined:
        return P("model", None)          # (F, H) -> F sharded
    if "attention" in joined and joined.endswith("kernel"):
        if "out" in joined.split("/")[-2]:
            return P("model", None, None)  # (heads, head_dim, H)
        return P(None, "model", None)      # (H, heads, head_dim)
    if "attention" in joined and joined.endswith("bias") and leaf.ndim == 2:
        return P("model", None)            # qkv bias (heads, head_dim)
    return P()  # replicate embeddings, LN, 1-d biases


def make_param_shardings(mesh, params):
    import jax
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_partition_spec(path, leaf)),
        params,
    )


def mean_pool(hidden, mask):
    """Masked mean pooling over tokens (sentence-transformers style)."""
    m = mask[:, :, None].astype(hidden.dtype)
    summed = jnp.sum(hidden * m, axis=1)
    counts = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return summed / counts


def l2_normalize(x, eps: float = 1e-12):
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)

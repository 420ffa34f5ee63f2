"""Cross-encoder reranker: (query, doc) pair -> relevance score on TPU.

Replaces the reference's lazily-constructed torch CrossEncoder
(ms-marco-MiniLM-L-6-v2, reference api/app.py:95-104).  Same trunk as the
bi-encoder plus a CLS pooler + 1-logit classifier, matching the HF
BertForSequenceClassification layout so pretrained rerank weights import.
"""

from __future__ import annotations

import hashlib

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_rag.models.bert import BertEncoder, BertSpec
from tpu_rag.models.biencoder import spec_for_model
from tpu_rag.models.tokenizer import encode_pair_batch, load_tokenizer


class CrossEncoderModule(nn.Module):
    spec: BertSpec
    dtype: jnp.dtype = jnp.float32
    flash: bool = False

    @nn.compact
    def __call__(self, ids, mask, type_ids):
        hidden = BertEncoder(self.spec, dtype=self.dtype, flash=self.flash,
                             name="bert")(ids, mask, type_ids)
        cls = hidden[:, 0, :]
        pooled = jnp.tanh(nn.Dense(self.spec.hidden, dtype=self.dtype, name="pooler")(cls))
        logit = nn.Dense(1, dtype=self.dtype, name="classifier")(pooled)
        return logit[:, 0].astype(jnp.float32)


class CrossEncoder:
    def __init__(
        self,
        model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2",
        *,
        weights_path: str = "",
        tokenizer_path: str = "",
        seq_len: int = 256,
        batch: int = 32,
        dtype: str = "bfloat16",
        spec: BertSpec | None = None,
    ) -> None:
        self.model_name = model_name
        self.spec = spec or spec_for_model(model_name)
        self.compute_dtype = jnp.bfloat16 if (dtype == "bfloat16" and jax.default_backend() == "tpu") else jnp.float32
        # an orbax checkpoint (scripts/train_reranker.py) fixes the
        # architecture: derive the spec from its shapes before building the
        # module, exactly like BiEncoder does for embedding checkpoints
        from tpu_rag.models.biencoder import _load_orbax_params

        restored = _load_orbax_params(weights_path) if weights_path else None
        if restored is not None:
            from tpu_rag.models.bert import spec_from_params

            restored = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float32), restored)
            self.spec = spec_from_params(restored.get("bert", restored), self.spec)
        self.seq_len = min(seq_len, self.spec.max_len)
        self.batch = batch
        self.tokenizer = load_tokenizer(tokenizer_path, vocab_size=self.spec.vocab_size)
        import os

        # serving reranker: fused-attention kernel on TPU (see BiEncoder);
        # the reranker trainer builds its own module with flash off
        flash = (jax.default_backend() == "tpu"
                 and os.getenv("FLASH_ATTENTION", "1") != "0")
        self.module = CrossEncoderModule(self.spec, dtype=self.compute_dtype,
                                         flash=flash)
        self.params = restored if restored is not None else self._init_params(weights_path)
        self._jit_cache: dict[tuple[int, int], any] = {}

    def _init_params(self, weights_path: str):
        if weights_path:
            from tpu_rag.models.hf_import import load_cross_encoder_params
            params = load_cross_encoder_params(weights_path, self.spec)
            if params is not None:
                return params
        seed = int.from_bytes(hashlib.blake2b(self.model_name.encode(), digest_size=4).digest(), "little")
        rng = jax.random.PRNGKey(seed)
        z = jnp.zeros((1, 8), jnp.int32)
        return self.module.init(rng, z, jnp.ones((1, 8), jnp.int32), z)["params"]

    def _forward_fn(self, b: int, t: int):
        fn = self._jit_cache.get((b, t))
        if fn is None:
            module = self.module

            @jax.jit
            def fwd(params, ids, mask, types):
                return module.apply({"params": params}, ids, mask, types)

            fn = fwd
            self._jit_cache[(b, t)] = fn
        return fn

    def predict(self, pairs: list[tuple[str, str]]) -> np.ndarray:
        """Scores for [query, text] pairs (parity with CrossEncoder.predict,
        reference api/app.py:573)."""
        if not pairs:
            return np.zeros((0,), np.float32)
        out = np.zeros((len(pairs),), np.float32)
        i = 0
        while i < len(pairs):
            chunk = pairs[i : i + self.batch]
            b = self.batch if len(chunk) > 8 else 8
            ids, mask, types = encode_pair_batch(self.tokenizer, chunk, self.seq_len, batch=b)
            fn = self._forward_fn(b, self.seq_len)
            scores = fn(self.params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))
            out[i : i + len(chunk)] = np.asarray(scores)[: len(chunk)]
            i += len(chunk)
        return out

"""Contrastive trainer + graft entry tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from tpu_rag.models.bert import BertSpec
from tpu_rag.train.contrastive import ContrastiveTrainer, info_nce_loss


def _mesh(dp, tp):
    devices = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devices, axis_names=("data", "model"))


def _batch(rng, b, seq, vocab=512):
    return {
        "q_ids": rng.integers(4, vocab, (b, seq)).astype(np.int32),
        "q_mask": np.ones((b, seq), np.int32),
        "d_ids": rng.integers(4, vocab, (b, seq)).astype(np.int32),
        "d_mask": np.ones((b, seq), np.int32),
    }


def test_info_nce_identity_is_low():
    import jax.numpy as jnp

    e = jnp.eye(8, 32)
    loss_same = info_nce_loss(e, e, tau=0.05)
    rng = np.random.default_rng(0)
    other = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    other = other / jnp.linalg.norm(other, axis=1, keepdims=True)
    loss_rand = info_nce_loss(e, other, tau=0.05)
    assert float(loss_same) < float(loss_rand)


def test_train_step_dp_tp_loss_decreases():
    mesh = _mesh(4, 2)
    spec = BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128, max_len=64)
    trainer = ContrastiveTrainer(spec, mesh, lr=5e-4)
    rng = np.random.default_rng(0)
    batch = _batch(rng, 8, 16)
    losses = [trainer.train_step(batch) for _ in range(8)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # overfits the fixed batch


def test_train_params_are_tp_sharded():
    mesh = _mesh(4, 2)
    spec = BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128, max_len=64)
    trainer = ContrastiveTrainer(spec, mesh)
    ffn_kernel = trainer.params["layer_0"]["intermediate"]["kernel"]
    spec_found = ffn_kernel.sharding.spec
    assert "model" in str(spec_found)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 384)
    norms = np.linalg.norm(np.asarray(out), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_graft_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_train_save_load_roundtrip(tmp_path):
    """trainer.save -> BiEncoder(weights_path=ckpt) restores the params."""
    spec = BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128, max_len=64)
    mesh = _mesh(1, 1)
    trainer = ContrastiveTrainer(spec, mesh, lr=1e-4)
    rng = np.random.default_rng(0)
    trainer.train_step(_batch(rng, 4, 16))
    ckpt = tmp_path / "ckpt"
    trainer.save(str(ckpt))

    from tpu_rag.models.biencoder import BiEncoder

    enc = BiEncoder(spec=spec, weights_path=str(ckpt), seq_len=32, batch=8)
    trained_emb = np.asarray(trainer.params["word_embeddings"]["embedding"])
    loaded_emb = np.asarray(enc.params["word_embeddings"]["embedding"])
    np.testing.assert_allclose(loaded_emb, trained_emb, atol=1e-6)
    out = enc.embed(["hello world"])
    assert out.shape == (1, 64)


def test_ckpt_spec_inference_without_explicit_spec(tmp_path):
    """Serving must derive the architecture from the checkpoint's shapes:
    a ckpt trained at max_len=64/hidden=64 loaded WITHOUT spec= (the
    EMBEDDING_WEIGHTS env path) must not be applied under the name-derived
    minilm-l6 defaults (max_len=512) — that raises ScopeParamShapeError and
    silently degrades retrieval to keyword-only."""
    spec = BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128, max_len=64)
    trainer = ContrastiveTrainer(spec, _mesh(1, 1), lr=1e-4)
    ckpt = tmp_path / "ckpt"
    trainer.save(str(ckpt))

    from tpu_rag.models.biencoder import BiEncoder

    enc = BiEncoder("sentence-transformers/all-MiniLM-L6-v2",
                    weights_path=str(ckpt), seq_len=256, batch=8)
    assert (enc.spec.hidden, enc.spec.layers, enc.spec.heads, enc.spec.ffn,
            enc.spec.max_len, enc.spec.vocab_size) == (64, 2, 4, 128, 64, 512)
    assert enc.seq_len == 64  # clamped to the ckpt's position table
    out = enc.embed(["hello world", "a longer sentence " * 30])  # > max_len tokens
    assert out.shape == (2, 64)
    assert np.all(np.isfinite(out))

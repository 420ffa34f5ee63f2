"""Encoder tests: tokenizers, determinism, and numerical parity of the Flax
trunk against torch transformers BertModel (tiny random weights — the parity
check the reference never had, SURVEY.md §4/§7 step 2)."""

import numpy as np
import pytest

from tpu_rag.models import BiEncoder, CrossEncoder, HashTokenizer, load_tokenizer
from tpu_rag.models.bert import BertSpec
from tpu_rag.models.tokenizer import encode_batch, encode_pair_batch, pretokenize


def test_pretokenize_mixed_cjk_latin():
    toks = pretokenize("Hello, 世界! GPT-4 模型 abc_def")
    assert "hello" in toks
    assert "世" in toks and "界" in toks
    assert "模" in toks and "型" in toks
    assert "abc_def" in toks


def test_hash_tokenizer_deterministic():
    t1 = HashTokenizer()
    t2 = HashTokenizer()
    ids1 = t1.tokenize_ids("the quick 棕色 fox")
    ids2 = t2.tokenize_ids("the quick 棕色 fox")
    assert ids1 == ids2
    assert all(4 <= i < 30522 for i in ids1)


def test_wordpiece_tokenizer(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "quick", "fox", "un", "##able", "##s"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = load_tokenizer(str(vp))
    assert tok.name == "wordpiece"
    ids = tok.tokenize_ids("the unable foxs")
    inv = {i: t for i, t in enumerate(vocab)}
    assert [inv[i] for i in ids] == ["the", "un", "##able", "fox", "##s"]
    assert tok.tokenize_ids("zzz") == [tok.unk_id]


def test_encode_batch_shapes():
    tok = HashTokenizer()
    ids, mask = encode_batch(tok, ["hello world", "a"], 16, batch=8)
    assert ids.shape == (8, 16) and mask.shape == (8, 16)
    assert mask[0].sum() == 4  # CLS + 2 tokens + SEP
    assert mask[2].sum() == 0  # padding row


def test_encode_pair_batch_types():
    tok = HashTokenizer()
    ids, mask, types = encode_pair_batch(tok, [("a b", "c d e")], 16)
    assert types[0][mask[0] == 1].tolist() == [0, 0, 0, 0, 1, 1, 1, 1]


def test_biencoder_deterministic_and_normalized():
    enc = BiEncoder(spec=BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128, max_len=64),
                    seq_len=32, batch=8)
    e1 = enc.embed(["hello world", "quick brown fox"])
    e2 = enc.embed(["hello world", "quick brown fox"])
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(e1, axis=1), 1.0, atol=1e-5)
    assert e1.shape == (2, 64)
    # same text embeds identically across differently-sized batches
    e3 = enc.embed(["hello world"] + [f"pad {i}" for i in range(9)])
    np.testing.assert_allclose(e1[0], e3[0], atol=1e-4)


def test_biencoder_length_bucketing_parity():
    """Length-bucketed embed returns the SAME embeddings as a fixed-seq_len
    forward: padding is fully masked in attention and in the mean pool."""
    import jax.numpy as jnp

    from tpu_rag.models.tokenizer import encode_batch

    enc = BiEncoder(spec=BertSpec(vocab_size=512, hidden=64, layers=2, heads=4,
                                  ffn=128, max_len=64),
                    seq_len=64, batch=8)
    texts = ["short", "a few more words here",
             "a much longer text " * 6, "tiny", "mid length sentence ok",
             "another very long body of text with many words " * 3]
    bucketed = enc.embed(texts)
    # reference: everything padded to the full seq_len, original order
    ids, mask = encode_batch(enc.tokenizer, texts, enc.seq_len, batch=8)
    fn = enc._forward_fn(8, enc.seq_len)
    ref = np.asarray(fn(enc.params, jnp.asarray(ids), jnp.asarray(mask)))[:len(texts)]
    np.testing.assert_allclose(bucketed, ref, atol=2e-5)
    # mixed lengths actually exercised >1 seq bucket
    assert len({key[1] for key in enc._jit_cache}) > 1


def test_crossencoder_scores():
    ce = CrossEncoder(spec=BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128, max_len=64),
                      seq_len=32, batch=8)
    s = ce.predict([("query", "doc one"), ("query", "doc two")])
    assert s.shape == (2,)
    s2 = ce.predict([("query", "doc one"), ("query", "doc two")])
    np.testing.assert_allclose(s, s2, atol=1e-6)


@pytest.mark.parametrize("seq", [16])
def test_flax_matches_torch_bert(seq):
    """Numerical parity of the Flax trunk vs transformers BertModel."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from tpu_rag.models.bert import BertEncoder
    from tpu_rag.models.hf_import import map_bert_state_dict

    cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=seq, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = transformers.BertModel(cfg).eval()

    spec = BertSpec(vocab_size=128, hidden=32, layers=2, heads=4, ffn=64, max_len=seq)
    params = map_bert_state_dict({k: v.numpy() for k, v in tm.state_dict().items()}, spec)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, seq)).astype(np.int64)
    mask = np.ones((2, seq), np.int64)
    mask[1, seq // 2:] = 0
    ids[1, seq // 2:] = 0

    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    ours = BertEncoder(spec).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    ours = np.asarray(ours)
    # only compare unmasked positions (masked ones are junk in both)
    np.testing.assert_allclose(ours[0], ref[0], atol=2e-4)
    np.testing.assert_allclose(ours[1, : seq // 2], ref[1, : seq // 2], atol=2e-4)


def test_cross_encoder_import_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from tpu_rag.models.crossencoder import CrossEncoderModule
    from tpu_rag.models.hf_import import load_cross_encoder_params

    cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, hidden_act="gelu", num_labels=1,
    )
    torch.manual_seed(1)
    tm = transformers.BertForSequenceClassification(cfg).eval()

    spec = BertSpec(vocab_size=128, hidden=32, layers=2, heads=4, ffn=64, max_len=16)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        torch.save(tm.state_dict(), os.path.join(td, "pytorch_model.bin"))
        params = load_cross_encoder_params(td, spec)
    assert params is not None

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    types = np.zeros((2, 16), np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 token_type_ids=torch.tensor(types)).logits.numpy()[:, 0]

    ours = CrossEncoderModule(spec).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), jnp.asarray(types, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_encoder_batch_bucket_ladder():
    """EMBED_BATCH=256 serving windows must not pad a 40-query window to
    256: the bucket ladder includes every power of two up to the batch."""
    from tpu_rag.models.biencoder import BiEncoder

    enc = BiEncoder.__new__(BiEncoder)  # no weights needed for _bucket
    enc.mesh = None
    enc.batch = 256
    assert enc._bucket(3) == 8
    assert enc._bucket(40) == 64
    assert enc._bucket(100) == 128
    assert enc._bucket(256) == 256
    enc.batch = 64
    assert enc._bucket(40) == 64
    assert enc._bucket(70) == 64 or enc._bucket(70) == enc.batch  # clamped to batch


def test_bad_tokenizer_json_falls_back_to_hash(tmp_path):
    """A tokenizer.json that can't be parsed must fall back to the HASH
    tokenizer — falling through to WordPiece treated each JSON line as a
    vocab token and silently produced a garbage vocabulary."""
    from tpu_rag.models.tokenizer import HashTokenizer, load_tokenizer

    p = tmp_path / "tokenizer.json"
    p.write_text('{"not": "a tokenizer"}\n["more lines"]\n')
    tok = load_tokenizer(str(p), vocab_size=1024)
    assert isinstance(tok, HashTokenizer)


def test_tokenize_query_ids_rejects_oversized_batch():
    from tpu_rag.models.biencoder import BiEncoder

    import pytest

    spec = BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128,
                    max_len=64)
    enc = BiEncoder(spec=spec, batch=4, seq_len=32)
    with pytest.raises(ValueError):
        enc.tokenize_query_ids([f"text {i}" for i in range(9)], batch=4)


def test_fused_cache_tokens_are_unique():
    """Fused-path cache keys must not alias across encoder instances
    (id(self) is reused by the allocator after GC)."""
    from tpu_rag.models.biencoder import BiEncoder

    spec = BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128,
                    max_len=64)
    a = BiEncoder(spec=spec, batch=2, seq_len=32)
    k1 = a.fused_forward()[1]
    del a
    b = BiEncoder(spec=spec, batch=2, seq_len=32)
    k2 = b.fused_forward()[1]
    assert k1 != k2


def test_spec_from_hf_config(tmp_path):
    """prove_checkpoint derives the architecture from the checkpoint dir's
    config.json (HF convention) instead of guessing from the model name."""
    import json

    from tpu_rag.models.hf_import import spec_from_hf_config

    (tmp_path / "config.json").write_text(json.dumps({
        "vocab_size": 128, "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 64}))
    spec = spec_from_hf_config(tmp_path)
    assert (spec.vocab_size, spec.hidden, spec.layers, spec.heads,
            spec.ffn, spec.max_len) == (128, 32, 2, 4, 64, 64)
    assert spec_from_hf_config(tmp_path / "nope") is None
    (tmp_path / "bad").mkdir()
    (tmp_path / "bad" / "config.json").write_text("{not json")
    assert spec_from_hf_config(tmp_path / "bad") is None


def test_flash_attention_matches_xla_path():
    """The fused-attention kernel (ops/attention.py, interpret mode on CPU)
    must reproduce the XLA attention path's pooled embeddings bit-for-bit
    up to f32 noise, across padded rows and both head-group sizes — and the
    param tree must stay byte-compatible with the nn.MHA layout so every
    existing checkpoint loads unchanged."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from tpu_rag.models.bert import (BertEncoder, BertSpec, l2_normalize,
                                     mean_pool)

    spec = BertSpec(vocab_size=1000, hidden=64, layers=2, heads=4, ffn=128,
                    max_len=256)
    ids = np.array(jax.random.randint(jax.random.PRNGKey(0), (3, 128), 5, 999))
    ids[0, 40:] = 0
    ids[1, 100:] = 0
    mask = (ids != 0).astype(np.int32)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    ref = BertEncoder(spec, flash=False)
    fl = BertEncoder(spec, flash=True)
    params = ref.init(jax.random.PRNGKey(1), ids, mask)["params"]
    assert (jtu.tree_structure(params)
            == jtu.tree_structure(fl.init(jax.random.PRNGKey(1), ids,
                                          mask)["params"]))
    p_ref = l2_normalize(mean_pool(ref.apply({"params": params}, ids, mask),
                                   mask))
    p_fl = l2_normalize(mean_pool(fl.apply({"params": params}, ids, mask),
                                  mask))
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_fl),
                               atol=2e-6)


def test_fused_mha_head_group_sizes():
    """heads_per_step must not change results (including the indivisible
    fallback to 1) and the (B, T) key mask must be honored."""
    import jax
    import jax.numpy as jnp

    from tpu_rag.ops.attention import fused_mha

    b, t, h, d = 2, 128, 6, 16
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, t, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, t, h, d), jnp.float32)
    mask = np.ones((b, t), np.int32)
    mask[0, 50:] = 0
    mask = jnp.asarray(mask)

    import flax.linen as nn

    attn_mask = (mask[:, None, None, :] > 0) & (mask[:, None, :, None] > 0)
    want = nn.dot_product_attention(q, k, v, mask=attn_mask)
    outs = [np.asarray(fused_mha(q, k, v, mask, heads_per_step=g,
                                 interpret=True))
            for g in (0, 1, 2, 3, 4, 6, 5)]  # 5 does not divide 6 -> hb=1
    # pad-query rows diverge by design (dropped by pooling): compare real
    real = np.asarray(mask, bool)
    for o in outs:
        np.testing.assert_allclose(o[real], np.asarray(want)[real],
                                    atol=2e-5)

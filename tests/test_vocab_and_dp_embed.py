"""Corpus vocab training + data-parallel embedding tests."""

import numpy as np

import jax
from jax.sharding import Mesh

from tpu_rag.models.bert import BertSpec
from tpu_rag.models.biencoder import BiEncoder
from tpu_rag.models.tokenizer import WordPieceTokenizer
from tpu_rag.models.vocab_train import train_wordpiece_vocab, save_vocab


CORPUS = [
    "the moon temple stands on the silver cliff",
    "the dragon clans live in the northern mountains",
    "pilgrims climb the temple stairs at dusk",
    "龍族居住在北方山脈",
    "月之神殿矗立於銀崖之上",
] * 3


def test_vocab_trainer_coverage(tmp_path):
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=500, min_freq=1)
    assert vocab[:5] == ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    assert "the" in vocab and "temple" in vocab
    assert "龍" in vocab
    vp = tmp_path / "vocab.txt"
    save_vocab(vocab, vp)
    tok = WordPieceTokenizer(vp)
    # frequent word -> single token; every corpus text tokenizes without [UNK]
    assert len(tok.tokenize_ids("temple")) == 1
    for text in CORPUS:
        ids = tok.tokenize_ids(text)
        assert tok.unk_id not in ids, text
    # unseen word falls back to pieces, not necessarily UNK
    assert tok.tokenize_ids("montemple")  # suffix/char fallback works


def test_dp_embed_matches_single_device():
    spec = BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128, max_len=64)
    single = BiEncoder(spec=spec, seq_len=32, batch=8)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    sharded = BiEncoder(spec=spec, seq_len=32, batch=8, mesh=mesh)

    texts = [f"sentence number {i} about topic {i % 3}" for i in range(20)]
    e1 = single.embed(texts)
    e2 = sharded.embed(texts)
    np.testing.assert_allclose(e1, e2, atol=1e-5)
    assert e2.shape == (20, 64)


def test_tp_embed_matches_single_device():
    """TP serving (SURVEY.md §2.5 "shard encoder matmuls over ICI mesh
    axis"): a dp x tp mesh must produce the same embeddings as one device —
    XLA inserts the collectives for the model-sharded FFN/attention matmuls."""
    spec = BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128, max_len=64)
    single = BiEncoder(spec=spec, seq_len=32, batch=8)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), axis_names=("data", "model"))
    tp = BiEncoder(spec=spec, seq_len=32, batch=8, mesh=mesh)

    # params actually live sharded over the model axis (not replicated)
    ffn_kernel = tp.params["layer_0"]["intermediate"]["kernel"]
    assert ffn_kernel.sharding.spec == (None, "model"), ffn_kernel.sharding

    texts = [f"sentence number {i} about topic {i % 3}" for i in range(20)]
    e1 = single.embed(texts)
    e2 = tp.embed(texts)
    np.testing.assert_allclose(e1, e2, atol=1e-5)


def test_tp_only_mesh_embed():
    """A pure model-parallel mesh (no data axis) also serves correctly."""
    spec = BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128, max_len=64)
    single = BiEncoder(spec=spec, seq_len=32, batch=8)
    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("model",))
    tp = BiEncoder(spec=spec, seq_len=32, batch=8, mesh=mesh)
    texts = ["tensor parallel serving", "of a small encoder"]
    np.testing.assert_allclose(single.embed(texts), tp.embed(texts), atol=1e-5)

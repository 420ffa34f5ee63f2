"""C++ WordPiece vs pure-Python parity + speed sanity."""

import shutil
import time

import pytest

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "quick", "fox", "un",
         "##able", "##s", "dragon", "##fire", "龍", "山", "fire", "12", "##3"]


@pytest.fixture()
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB), encoding="utf-8")
    return str(p)


def _native(vocab_file):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from tpu_rag.native.binding import NativeWordPiece

    try:
        return NativeWordPiece(vocab_file)
    except Exception as e:
        pytest.skip(f"native build failed: {e}")


def test_native_matches_python(vocab_file):
    native = _native(vocab_file)
    from tpu_rag.models.tokenizer import WordPieceTokenizer

    py = WordPieceTokenizer(vocab_file)
    py._native = None  # force the pure-Python path

    cases = [
        "the quick fox",
        "unable foxs",
        "dragonfire 123",
        "THE QUICK FOX",           # lowercasing
        "龍在山",                   # CJK single-char tokens (在 -> UNK)
        "the,quick.fox-jumps",      # punctuation splits
        "",
        "zzz unknown wordz",
    ]
    for text in cases:
        assert native.tokenize_ids(text) == py.tokenize_ids(text), text


def test_wordpiece_tokenizer_uses_native(vocab_file):
    _native(vocab_file)  # ensure lib built
    from tpu_rag.models.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer(vocab_file)
    assert tok._native is not None
    assert tok.tokenize_ids("the quick fox") == [4, 5, 6]


def test_native_speed(vocab_file):
    native = _native(vocab_file)
    from tpu_rag.models.tokenizer import WordPieceTokenizer

    py = WordPieceTokenizer(vocab_file)
    py._native = None
    text = "the quick fox unable foxs dragonfire " * 200

    t0 = time.perf_counter()
    for _ in range(50):
        native.tokenize_ids(text)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(50):
        py.tokenize_ids(text)
    t_py = time.perf_counter() - t0
    # the native path should be clearly faster on long text
    assert t_native < t_py, (t_native, t_py)

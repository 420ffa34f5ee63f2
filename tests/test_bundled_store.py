"""The checked-in demo store (examples/store) must stay loadable and
searchable with the checked-in vocab — first-run UX parity with the
reference's bundled vector_store/ (BASELINE.md config #1 artifact)."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STORE = os.path.join(REPO, "examples", "store", "gamefantasy")
VOCAB = os.path.join(REPO, "examples", "vocab.txt")


@pytest.mark.skipif(not os.path.isdir(STORE), reason="store not built")
def test_bundled_store_loads_and_searches():
    from tpu_rag.index import load_index

    idx = load_index(STORE, use_pallas=False)
    assert idx.count() >= 1000  # ~250 docs x 4 chunks
    st = idx.state()
    x = np.asarray(st["vectors"], np.float32)
    # stored vectors are L2-normalized
    np.testing.assert_allclose(np.linalg.norm(x[:8], axis=1), 1.0, atol=1e-3)
    # self-search: a stored vector's top-1 is itself
    r = idx.search(x[13:14], 3)
    assert r.rows[0][0] == 13
    # metadata carries the demo corpus schema
    assert {"namespace", "canonicality", "title"} <= set(r.metadatas[0][0])


@pytest.mark.skipif(not os.path.isdir(STORE) or not os.path.isfile(VOCAB),
                    reason="store/vocab not built")
def test_bundled_store_text_query_roundtrip():
    """Text query through the SAME tokenizer the store was built with
    returns the matching chunk (identical text -> sim ~1)."""
    import json

    from tpu_rag.index import load_index
    from tpu_rag.models.biencoder import BiEncoder

    idx = load_index(STORE, use_pallas=False)
    enc = BiEncoder("sentence-transformers/all-MiniLM-L6-v2",
                    tokenizer_path=VOCAB, seq_len=128, batch=8)
    doc = json.load(open(os.path.join(
        REPO, "examples", "docs", "lore", "demo-0000.json")))
    text = f"{doc['title']}\n\n{doc['summary']}"
    qv = enc.embed([text])
    r = idx.search(qv, 1)
    assert r.ids[0][0] == "demo-0000::summary"
    assert r.similarities[0][0] > 0.98

"""Fused embed+search (FlatIndex.search_fused + engine wiring): the encoder
forward and the top-k scan compile into ONE executable, so a cold /search
costs a single device dispatch.  Results must match the two-step path."""

import numpy as np

from tpu_rag.config import Config
from tpu_rag.engine import RagEngine
from tpu_rag.index.flat import FlatIndex
from tpu_rag.models.biencoder import BiEncoder
from tpu_rag.retrieval.hybrid import vector_hits


def _cfg(tmp_path, name, **kw):
    return Config(
        persist_dir=str(tmp_path / f"vs-{name}"),
        kb_db_path=str(tmp_path / f"db-{name}/kb.sqlite3"),
        db_path=str(tmp_path / f"db-{name}/app.sqlite3"),
        docs_dir=str(tmp_path / f"docs-{name}"),
        index_dtype="float32", use_pallas=False, summarize_mode="off", **kw)


def _seed(eng, enc, n=24):
    docs = [f"document {i} about topic-{i % 5} with unique token tok{i}"
            for i in range(n)]
    eng.index.add([f"d{i}" for i in range(n)], enc.embed(docs), docs,
                  [{"namespace": "even" if i % 2 == 0 else "odd"}
                   for i in range(n)])
    return docs


def test_fused_matches_two_step(tmp_path):
    enc = BiEncoder("tiny", seq_len=32, batch=8)
    eng = RagEngine(_cfg(tmp_path, "direct", microbatch=False), encoder=enc)
    assert type(eng.index) is FlatIndex
    _seed(eng, enc)

    q = "document about topic-2 tok7"
    hits = eng.query_vector(q, 5, None, None)
    # fused executable was compiled and used
    assert any(isinstance(key, tuple) and key and key[0] == "fused"
               for key in eng.index._xla_fn_cache), "fused path not taken"
    # reference: classic embed-then-search
    ref = vector_hits(eng.index, enc.embed([q]), 5, None, None)
    assert [h["id"] for h in hits] == [h["id"] for h in ref]
    assert np.allclose([h["score"] for h in hits], [h["score"] for h in ref],
                       atol=1e-5)
    # the fused path stored the query embedding, so the warm path reuses it
    hits2 = eng.query_vector(q, 5, None, None)
    assert [h["id"] for h in hits2] == [h["id"] for h in hits]


def test_fused_respects_metadata_filter(tmp_path):
    enc = BiEncoder("tiny", seq_len=32, batch=8)
    eng = RagEngine(_cfg(tmp_path, "filter", microbatch=False), encoder=enc)
    _seed(eng, enc)
    hits = eng.query_vector("document topic-1 tok3", 6, "odd", None)
    assert hits and all(h["metadata"]["namespace"] == "odd" for h in hits)
    # unseen tag -> fused returns None -> fallback path yields [] hits
    assert eng.query_vector("document", 3, "no-such-ns", None) == []


def test_fused_through_microbatcher(tmp_path):
    enc = BiEncoder("tiny", seq_len=32, batch=8)
    eng = RagEngine(_cfg(tmp_path, "mb", microbatch=True), encoder=enc)
    _seed(eng, enc)
    q = "document about topic-4 tok9"
    hits = eng.query_vector(q, 4, None, None)
    ref = vector_hits(eng.index, enc.embed([q]), 4, None, None)
    assert [h["id"] for h in hits] == [h["id"] for h in ref]
    assert any(isinstance(key, tuple) and key and key[0] == "fused"
               for key in eng.index._xla_fn_cache)


def test_fused_whole_window_batch(tmp_path):
    """A microbatch window of distinct same-filter queries goes through ONE
    fused dispatch and matches the two-step results row for row."""
    enc = BiEncoder("tiny", seq_len=32, batch=8)
    eng = RagEngine(_cfg(tmp_path, "window", microbatch=True), encoder=enc)
    _seed(eng, enc)
    queries = [f"document topic-{i} tok{i}" for i in range(3)]
    out = eng._run_vector_batch([(q, 4, None, None) for q in queries])
    assert len(out) == 3
    for q, hits in zip(queries, out):
        ref = vector_hits(eng.index, enc.embed([q]), 4, None, None)
        assert [h["id"] for h in hits] == [h["id"] for h in ref]


def test_fused_falls_back_for_fake_encoder(tmp_path):
    """Encoders without fused_forward (e.g. test fakes) just use the
    two-step path — no errors, same results."""
    from tests.test_api import FakeEncoder

    enc = FakeEncoder()
    eng = RagEngine(_cfg(tmp_path, "fake", microbatch=False), encoder=enc)
    docs = ["alpha beta", "beta gamma", "gamma delta"]
    eng.index.add(["a", "b", "c"], enc.embed(docs), docs, [{} for _ in docs])
    hits = eng.query_vector("beta", 2, None, None)
    assert len(hits) == 2
    assert not any(isinstance(key, tuple) and key and key[0] == "fused"
                   for key in eng.index._xla_fn_cache)


def test_fused_device_refine_bf16_matches_host_refine(tmp_path):
    """bf16 fused serving path: the device-side int8-residual refine must
    produce the same ids as the host f32 refine (recall-1.0 contract) while
    reading back only k scores+ids (no query embeddings)."""
    rng = np.random.default_rng(0)
    n, d, k = 5000, 64, 10
    centers = rng.standard_normal((16, d)).astype(np.float32)
    x = (centers[rng.integers(0, 16, n)]
         + 0.25 * rng.standard_normal((n, d))).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]

    dev = FlatIndex(d, dtype="bfloat16", use_pallas=False)
    dev.add(ids, x)
    host = FlatIndex(d, dtype="bfloat16", use_pallas=False)
    host.device_refine = False          # forces the host f32 refine path
    host.add(ids, x)

    enc = BiEncoder("tiny", seq_len=32, batch=8)

    class VecEnc:
        """Encoder stand-in whose 'forward' returns fixed query vectors."""
        def fwd(self, qmat):
            import jax.numpy as jnp
            qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

            def forward(params, ids, mask=None):
                return jnp.asarray(qn[: ids.shape[0]])
            return forward

    q = (centers[rng.integers(0, 16, 4)]
         + 0.25 * rng.standard_normal((4, d))).astype(np.float32)
    fake_ids = np.zeros((4, 8), np.int32)
    fwd = VecEnc().fwd(q)
    out_dev = dev.search_fused(fwd, "vecenc", {}, fake_ids, None, 4, k,
                               return_qv=False)
    out_host = host.search_fused(fwd, "vecenc", {}, fake_ids, None, 4, k,
                                 return_qv=False)
    assert out_dev is not None and out_host is not None
    res_dev, qv_dev = out_dev
    res_host, qv_host = out_host
    assert qv_dev is None          # no embedding readback on the device path
    assert "r_vectors" in dev.device_snapshot()
    assert "r_vectors" not in host.device_snapshot()
    assert res_dev.ids == res_host.ids
    for a, b in zip(res_dev.similarities, res_host.similarities):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_fused_append_block_scanned_in_executable(tmp_path):
    """Rows added after the snapshot are found by the fused path (the append
    block is scanned inside the same executable) and deletes are honored."""
    enc = BiEncoder("tiny", seq_len=32, batch=8)
    cfg = _cfg(tmp_path, "appendfused", microbatch=False)
    cfg.index_dtype = "bfloat16"
    eng = RagEngine(cfg, encoder=enc)
    _seed(eng, enc, n=24)
    eng.query_vector("warm snapshot", 3, None, None)
    assert eng.index.snapshot_stats["full_rebuilds"] == 1

    doc = "freshly appended super unique zanzibar document"
    eng.index.add(["fresh"], enc.embed([doc]), [doc], [{}])
    # identical text -> identical embedding -> the appended row is top-1
    hits = eng.query_vector(doc, 3, None, None)
    assert hits and hits[0]["id"] == "fresh"
    assert eng.index.snapshot_stats["full_rebuilds"] == 1  # incremental

    eng.index.delete(ids=["fresh"])
    eng._qvec_cache.clear()  # force the fused path again for the same text
    hits = eng.query_vector(doc, 3, None, None)
    assert all(h["id"] != "fresh" for h in hits)
    assert eng.index.snapshot_stats["full_rebuilds"] == 1


def test_query_vector_batch_takes_fused_path(tmp_path):
    enc = BiEncoder("tiny", seq_len=32, batch=8)
    eng = RagEngine(_cfg(tmp_path, "qbatch", microbatch=False), encoder=enc)
    docs = _seed(eng, enc)
    qs = [f"document about topic-{i % 5} tok{i}" for i in range(12)]  # > batch
    got = eng.query_vector_batch(qs, 5, None, None)
    assert len(got) == 12
    ref = [[h["id"] for h in vector_hits(eng.index, enc.embed([q]), 5, None, None)]
           for q in qs]
    assert [[h["id"] for h in hits] for hits in got] == ref


def test_fused_readback_ids_are_normal_floats(tmp_path):
    """Regression for the v5e all-ids-decode-to-row-0 serving bug: the fused
    readback packs int32 row ids into the f32 result by bitcast, and raw ids
    < 2^23 are DENORMAL bitpatterns (id -1 is a NaN) that real TPU hardware
    flushes to zero in data movement.  CPU preserves the bits, so this test
    asserts the encoding invariant instead: every id lane of the packed
    array must be a normal finite float (exponent != 0), which the _ID_BIAS
    guarantees for ids in [-1, 2^31 - 2^24 - 2) on every backend (above that
    the bias lands in the 0x7F800000+ inf/NaN binade)."""
    import jax

    from tpu_rag.index import flat as flat_mod

    enc = BiEncoder("tiny", seq_len=32, batch=8)
    eng = RagEngine(_cfg(tmp_path, "normal", microbatch=False), encoder=enc)
    _seed(eng, enc)

    captured = {}
    orig_jit = jax.jit

    def spy_jit(fn, *a, **kw):
        jitted = orig_jit(fn, *a, **kw)

        def wrapped(*args, **kwargs):
            out = jitted(*args, **kwargs)
            captured["packed"] = np.asarray(out)
            return out
        return wrapped

    flat_mod.jax.jit = spy_jit
    try:
        eng.index._xla_fn_cache.clear()
        hits = eng.query_vector("document about topic-2 tok7", 5, None, None)
    finally:
        flat_mod.jax.jit = orig_jit
    assert hits and "packed" in captured
    k_out = 5
    id_lanes = captured["packed"][:, k_out:2 * k_out]
    bits = np.ascontiguousarray(id_lanes, np.float32).view(np.uint32)
    exponents = (bits >> 23) & 0xFF
    assert (exponents != 0).all(), "denormal id bitpatterns reach the wire"
    assert (exponents != 0xFF).all(), "NaN/inf id bitpatterns reach the wire"
    # and the decode still matches the two-step reference path
    ref = vector_hits(eng.index, enc.embed(["document about topic-2 tok7"]),
                      5, None, None)
    assert [h["id"] for h in hits] == [h["id"] for h in ref]

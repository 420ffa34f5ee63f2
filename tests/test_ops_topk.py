"""Kernel unit tests: fused matmul+top-k vs brute-force ground truth.

The reference had no retrieval-quality tests at all (SURVEY.md §4); these
validate the Pallas kernel (interpret mode on CPU) against an independent
numpy implementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_rag.ops import PAD_TAG, fused_matmul_topk, quantize_int8_rows, topk_xla_reference


def _make(n=3000, d=384, q=5, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = rng.standard_normal((q, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return qs, x


def _numpy_topk(qs, x, k, ns=None, want_ns=-1):
    scores = qs @ x.T
    if ns is not None and want_ns >= 0:
        scores[:, ns != want_ns] = -np.inf
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_fused_matches_numpy_f32():
    qs, x = _make()
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x), 10)
    ref_sc, ref_ids = _numpy_topk(qs, x, 10)
    assert np.array_equal(np.array(ids), ref_ids)
    np.testing.assert_allclose(np.array(sc), ref_sc, atol=1e-5)


def test_xla_reference_matches_numpy():
    qs, x = _make()
    sc, ids = topk_xla_reference(jnp.array(qs), jnp.array(x), 10)
    ref_sc, ref_ids = _numpy_topk(qs, x, 10)
    assert np.array_equal(np.array(ids), ref_ids)


@pytest.mark.parametrize("k", [1, 5, 20])
def test_fused_various_k(k):
    qs, x = _make(n=1500)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x), k)
    _, ref_ids = _numpy_topk(qs, x, k)
    assert np.array_equal(np.array(ids), ref_ids)


def test_fused_bf16_recall():
    qs, x = _make(n=5000)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x, dtype=jnp.bfloat16), 10)
    _, ref_ids = _numpy_topk(qs, x, 10)
    recall = np.mean([
        len(set(np.array(ids)[i]) & set(ref_ids[i])) / 10 for i in range(len(qs))
    ])
    assert recall >= 0.95


def test_fused_int8_recall():
    qs, x = _make(n=5000)
    vals, scales = quantize_int8_rows(jnp.array(x))
    sc, ids = fused_matmul_topk(jnp.array(qs), vals, 10, db_scales=scales)
    _, ref_ids = _numpy_topk(qs, x, 10)
    recall = np.mean([
        len(set(np.array(ids)[i]) & set(ref_ids[i])) / 10 for i in range(len(qs))
    ])
    assert recall >= 0.9


def test_fused_metadata_filter():
    qs, x = _make(n=2000)
    rng = np.random.default_rng(1)
    ns = rng.integers(0, 3, 2000).astype(np.int32)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x), 10,
                                ns_tags=jnp.array(ns), want_ns=2)
    ref_sc, ref_ids = _numpy_topk(qs, x, 10, ns=ns, want_ns=2)
    assert np.array_equal(np.array(ids), ref_ids)
    assert set(ns[np.array(ids).ravel()]) == {2}


def test_fused_filter_fewer_than_k():
    """When fewer rows match the filter than k, missing slots have id -1."""
    qs, x = _make(n=300, q=2)
    ns = np.zeros(300, np.int32)
    ns[:4] = 7
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x), 10,
                                ns_tags=jnp.array(ns), want_ns=7)
    ids = np.array(ids)
    sc = np.array(sc)
    for qi in range(2):
        valid = np.isfinite(sc[qi])
        assert valid.sum() == 4
        assert set(ids[qi][valid]) == {0, 1, 2, 3}


def test_fused_small_n():
    """n smaller than one tile (padding path)."""
    qs, x = _make(n=17, q=3)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x), 5)
    _, ref_ids = _numpy_topk(qs, x, 5)
    assert np.array_equal(np.array(ids), ref_ids)


def test_quantize_roundtrip():
    _, x = _make(n=100)
    vals, scales = quantize_int8_rows(jnp.array(x))
    from tpu_rag.ops import dequantize_int8_rows
    back = np.array(dequantize_int8_rows(vals, scales))
    np.testing.assert_allclose(back, x, atol=1.5 / 127)


def test_fused_assume_padded_matches():
    from tpu_rag.ops.topk import default_block_n

    qs, x = _make(n=3000)
    bn = default_block_n(384, 4, 2048)
    n_pad = -(-3000 // bn) * bn
    xp = np.zeros((n_pad, 384), np.float32)
    xp[:3000] = x
    ns = np.full((n_pad,), PAD_TAG, np.int32)
    ns[:3000] = 0
    sc, ids = fused_matmul_topk(
        jnp.array(qs), jnp.array(xp), 10,
        ns_tags=jnp.array(ns), canon_tags=jnp.array(ns),
        assume_padded=True, block_n=bn)
    _, ref_ids = _numpy_topk(qs, x, 10)
    assert np.array_equal(np.array(ids), ref_ids)


def test_xla_reference_excludes_padded_rows():
    """Padding rows (PAD_TAG) must never win even when real scores are negative."""
    qs, x = _make(n=100, q=2)
    n_pad = 160
    xp = np.zeros((n_pad, 384), np.float32)
    xp[:100] = -np.abs(x)  # all real scores <= 0; zero padding rows score 0
    ns = np.full((n_pad,), PAD_TAG, np.int32)
    ns[:100] = 0
    sc, ids = topk_xla_reference(jnp.array(qs), jnp.array(xp), 5,
                                 ns_tags=jnp.array(ns))
    assert np.array(ids).max() < 100


def test_bucketed_topk_recall():
    qs, x = _make(n=8000, q=6)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x), 10, mode="bucketed")
    _, ref_ids = _numpy_topk(qs, x, 10)
    recalls = [len(set(np.array(ids)[i]) & set(ref_ids[i])) / 10 for i in range(6)]
    assert np.mean(recalls) >= 0.9


def test_bucketed_top1_exact():
    """k=1 bucketed is exact: the global max always survives bucket-max."""
    qs, x = _make(n=4000, q=5, seed=3)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x), 1, mode="bucketed")
    _, ref_ids = _numpy_topk(qs, x, 1)
    assert np.array_equal(np.array(ids), ref_ids)


def test_bucketed_with_filter():
    qs, x = _make(n=3000, q=3, seed=4)
    rng = np.random.default_rng(5)
    ns = rng.integers(0, 3, 3000).astype(np.int32)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x), 5,
                                ns_tags=jnp.array(ns), want_ns=1, mode="bucketed")
    picked = np.array(ids)
    assert set(ns[picked[np.isfinite(np.array(sc))].ravel()]) <= {1}


def test_query_batches_beyond_qp_max_are_chunked():
    """Query batches larger than QP_MAX split into multiple kernel calls
    with results identical to the unchunked reference."""
    from tpu_rag.ops.topk import QP_MAX

    qs, x = _make(n=2000, q=QP_MAX + 37, seed=6)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x), 5)
    ref_sc, ref_ids = _numpy_topk(qs, x, 5)
    assert np.array(ids).shape == (QP_MAX + 37, 5)
    assert np.array_equal(np.array(ids), ref_ids)


def test_dma_floor_scan_reduces_whole_corpus():
    """The streaming-floor kernel must read every element (its sum equals
    the full-corpus sum) — otherwise the measured 'DMA floor' would not be
    a valid denominator for the scan kernels' speed-of-light fraction."""
    import jax

    from tpu_rag.ops.topk import dma_floor_scan

    x = jax.random.normal(jax.random.PRNGKey(3), (1024, 384)).astype(jnp.bfloat16)
    s = float(dma_floor_scan(x, bn=256, interpret=True))
    ref = float(jnp.sum(x.astype(jnp.float32)))
    assert abs(s - ref) < abs(ref) * 1e-2 + 1.0
    x8 = (x * 63).astype(jnp.int8)
    s8 = float(dma_floor_scan(x8, bn=256, interpret=True))
    assert abs(s8 - float(jnp.sum(x8.astype(jnp.float32)))) < 1.0


# ---------------------------------------------------------------- packed mode

def test_packed_topk_recall_bf16():
    """Packed score|index selection as served: 2x-oversampled scan (the
    always-on bf16 refine, flat.py refine_k_scan) + f32 re-score recovers
    the f32 ground-truth top-k exactly; the raw packed candidates alone are
    within bf16 resolution of it."""
    qs, x = _make(n=6000, q=6, seed=21)
    k = 10
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x, jnp.bfloat16),
                                2 * k, mode="packed")
    ids = np.array(ids)
    _, ref_ids = _numpy_topk(qs, x, k)
    hits = 0
    for i in range(len(qs)):
        exact = x[ids[i]] @ qs[i]              # f32 re-score (refine stage)
        top = ids[i][np.argsort(-exact, kind="stable")[:k]]
        hits += len(set(top) & set(ref_ids[i]))
    assert hits / (k * len(qs)) >= 0.99
    # raw packed candidates: scores quantized to ~2^-8 relative
    ref_sc = np.take_along_axis(qs @ x.T, ids, axis=1)
    np.testing.assert_allclose(np.array(sc), ref_sc, rtol=2e-2, atol=2e-2)


def test_packed_topk_int8():
    qs, x = _make(n=4000, q=4, seed=22)
    vals, scales = quantize_int8_rows(jnp.array(x))
    sc, ids = fused_matmul_topk(jnp.array(qs), vals, 10, db_scales=scales,
                                mode="packed")
    _, ref_ids = _numpy_topk(qs, x, 10)
    ids = np.array(ids)
    rec = np.mean([len(set(ids[i]) & set(ref_ids[i])) / 10 for i in range(4)])
    assert rec >= 0.95  # int8 quantization error dominates, same as exact-int8


def test_packed_tiebreak_lowest_index():
    """Rows with identical scores must come back lowest-index-first — the
    packed index bits break ties exactly like the exact kernel's min-over-
    iota (determinism contract for cross-shard merges)."""
    d = 128
    row = np.zeros((1, d), np.float32)
    row[0, 0] = 1.0
    x = np.repeat(row, 600, axis=0)  # 600 identical rows
    qs = row.copy()
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x, jnp.bfloat16), 5,
                                mode="packed")
    assert np.array_equal(np.array(ids)[0], np.arange(5))
    e_sc, e_ids = fused_matmul_topk(jnp.array(qs), jnp.array(x, jnp.bfloat16),
                                    5, mode="exact")
    assert np.array_equal(np.array(ids), np.array(e_ids))


def test_packed_filter_and_all_masked():
    qs, x = _make(n=2000, q=3, seed=23)
    ns = (np.arange(2000) % 3).astype(np.int32)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x, jnp.bfloat16), 8,
                                ns_tags=jnp.array(ns), want_ns=1,
                                mode="packed")
    ids = np.array(ids)
    assert all(ns[i] == 1 for row in ids for i in row if i >= 0)
    _, ref_ids = _numpy_topk(qs, x, 8, ns=ns, want_ns=1)
    rec = np.mean([len(set(ids[i]) & set(ref_ids[i])) / 8 for i in range(3)])
    assert rec >= 0.95
    # a tag no row carries: every slot -1 / -inf (NOT NaN — the -inf
    # bit pattern must survive the packed truncation+reconstruction)
    sc2, ids2 = fused_matmul_topk(jnp.array(qs), jnp.array(x, jnp.bfloat16), 8,
                                  ns_tags=jnp.array(ns), want_ns=77,
                                  mode="packed")
    assert np.all(np.array(ids2) == -1)
    assert np.all(np.isneginf(np.array(sc2)))


def test_packed_negative_scores():
    """Negative similarities exercise the sign-handling of the sortable-key
    transform (negative floats order by complemented low bits)."""
    rng = np.random.default_rng(24)
    x = rng.standard_normal((1000, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = -x[:3] + 0.01 * rng.standard_normal((3, 64)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x, jnp.bfloat16), 10,
                                mode="packed")
    _, ref_ids = _numpy_topk(qs, x, 10)
    ids = np.array(ids)
    rec = np.mean([len(set(ids[i]) & set(ref_ids[i])) / 10 for i in range(3)])
    assert rec >= 0.99
    assert np.all(np.isfinite(np.array(sc)))


def test_packed_randomized_parity_sweep():
    """Randomized shapes/k/filters: packed candidates at 2x oversample +
    f32 re-score must recover the exact f32 top-k (the serving contract),
    across odd n (padding), small n, k=1, filters, and negative scores."""
    rng = np.random.default_rng(77)
    for trial in range(6):
        n = int(rng.integers(300, 7000))
        d = int(rng.choice([32, 64, 128]))
        k = int(rng.choice([1, 5, 17]))
        qn = int(rng.integers(1, 6))
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        qs = rng.standard_normal((qn, d)).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        ns = (np.arange(n) % 4).astype(np.int32)
        want = int(rng.choice([-1, 2]))
        sc, ids = fused_matmul_topk(
            jnp.array(qs), jnp.array(x, jnp.bfloat16), 2 * k,
            ns_tags=jnp.array(ns), want_ns=want, mode="packed")
        ids = np.array(ids)
        scores = qs @ x.T
        if want >= 0:
            scores[:, ns != want] = -np.inf
        ref = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        hits = 0
        for i in range(qn):
            cand = ids[i][ids[i] >= 0]
            if want >= 0:
                assert all(ns[c] == want for c in cand)
            exact = x[cand] @ qs[i]
            top = cand[np.argsort(-exact, kind="stable")[:k]]
            hits += len(set(top) & set(ref[i]))
        assert hits >= 0.99 * k * qn, f"trial {trial}: {hits}/{k*qn}"


def test_bucketed_tiny_corpus_pads_instead_of_crashing():
    """Explicit mode="bucketed" with fewer bucket-maxima candidates than k
    must pad with -inf/-1 like every other mode (it used to raise inside
    lax.top_k)."""
    qs, x = _make(n=300, q=3, seed=31)
    sc, ids = fused_matmul_topk(jnp.array(qs), jnp.array(x), 10,
                                block_n=256, mode="bucketed")
    sc, ids = np.array(sc), np.array(ids)
    assert sc.shape == (3, 10) and ids.shape == (3, 10)
    for i in range(3):
        got = [r for r in ids[i] if r >= 0]
        assert len(got) >= 1
        assert all(s == -np.inf for s, r in zip(sc[i], ids[i]) if r < 0)


def test_filter_without_tags_matches_reference_semantics():
    """want_ns >= 0 with ns_tags=None: the filter cannot be evaluated, so it
    is ignored (topk_xla_reference semantics) — the fused path used to fill
    real rows with tag 0 and silently return zero matches."""
    qs, x = _make(n=500, q=4, seed=32)
    sc_f, ids_f = fused_matmul_topk(jnp.array(qs), jnp.array(x), 5, want_ns=7)
    sc_r, ids_r = topk_xla_reference(jnp.array(qs), jnp.array(x), 5, want_ns=7)
    assert np.array_equal(np.array(ids_f), np.array(ids_r))
    assert np.allclose(np.array(sc_f), np.array(sc_r), atol=1e-4)
    assert (np.array(ids_f) >= 0).all()


def test_reference_int8_without_scales():
    """int8 database with db_scales=None: topk_xla_reference substitutes unit
    scales exactly like fused_matmul_topk (it used to crash on None)."""
    from tpu_rag.ops.quant import quantize_int8_rows

    qs, x = _make(n=400, q=3, seed=33)
    vals, _ = quantize_int8_rows(jnp.array(x))
    sc_r, ids_r = topk_xla_reference(jnp.array(qs), vals, 5)
    sc_f, ids_f = fused_matmul_topk(jnp.array(qs), vals, 5)
    assert np.array_equal(np.array(ids_f), np.array(ids_r))

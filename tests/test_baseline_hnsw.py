"""First-party CPU HNSW baseline (native/hnsw.cc): correctness vs brute
force, persistence roundtrip, edge cases.  This is the measuring stick for
BASELINE.md config #1 (reference = Chroma/hnswlib on CPU)."""

import numpy as np
import pytest

from tpu_rag.baseline import CpuHnswIndex


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(7)
    d, n = 96, 12000
    centers = rng.normal(size=(40, d))
    x = (centers[rng.integers(0, 40, n)] + 0.3 * rng.normal(size=(n, d))).astype(np.float32)
    q = (centers[rng.integers(0, 40, 64)] + 0.3 * rng.normal(size=(64, d))).astype(np.float32)
    return x, q


def brute_topk(x, q, k):
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    return np.argsort(-(qn @ xn.T), kind="stable", axis=1)[:, :k]


def test_recall_vs_bruteforce(clustered):
    x, q = clustered
    idx = CpuHnswIndex(x.shape[1], len(x))
    idx.add(x)
    assert len(idx) == len(x)
    ids, dist = idx.search(q, 10, ef=64)
    gt = brute_topk(x, q, 10)
    recall = np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(q))])
    assert recall >= 0.95, f"recall@10 {recall:.3f} too low for ef=64"
    # distances are cosine distances, ascending per row
    assert np.all(np.diff(dist, axis=1) >= -1e-5)


def test_ef_tradeoff(clustered):
    """Higher ef must not reduce recall (beam monotonicity)."""
    x, q = clustered
    idx = CpuHnswIndex(x.shape[1], len(x))
    idx.add(x)
    gt = brute_topk(x, q, 10)

    def recall(ef):
        ids, _ = idx.search(q, 10, ef=ef)
        return np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(q))])

    assert recall(128) >= recall(16) - 0.02


def test_save_load_roundtrip(tmp_path, clustered):
    x, q = clustered
    idx = CpuHnswIndex(x.shape[1], len(x))
    idx.add(x)
    ids0, d0 = idx.search(q, 5, ef=48)
    path = tmp_path / "hnsw.bin"
    idx.save(str(path))
    idx2 = CpuHnswIndex.load(str(path))
    assert idx2.dim == x.shape[1]
    ids1, d1 = idx2.search(q, 5, ef=48)
    np.testing.assert_array_equal(ids0, ids1)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)


def test_small_index_padding():
    x = np.eye(3, 8, dtype=np.float32)
    idx = CpuHnswIndex(8, 16)
    idx.add(x, ids=np.array([10, 11, 12], dtype=np.int64))
    ids, _ = idx.search(x[:1], 5)
    assert set(ids[0][:3]) == {10, 11, 12}
    assert list(ids[0][3:]) == [-1, -1]  # padded rows


def test_capacity_guard():
    idx = CpuHnswIndex(4, 2)
    idx.add(np.ones((2, 4), dtype=np.float32))
    with pytest.raises(RuntimeError):
        idx.add(np.ones((1, 4), dtype=np.float32))


def test_single_thread_matches_multithread(clustered):
    x, q = clustered
    idx = CpuHnswIndex(x.shape[1], len(x))
    idx.add(x)
    ids_a, _ = idx.search(q, 10, ef=64, n_threads=1)
    ids_b, _ = idx.search(q, 10, ef=64, n_threads=8)
    np.testing.assert_array_equal(ids_a, ids_b)

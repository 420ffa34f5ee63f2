"""HostArenaIVF (beyond-HBM tier): recall vs int8-exact brute force, spill
accounting, filters, and save/load (mmap) round trip — all on the CPU
backend (interpret-mode kernels)."""

import numpy as np
import pytest

import jax.numpy as jnp


def _mk_corpus(n=4000, d=64, n_centers=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    x = (centers[rng.integers(0, n_centers, n)]
         + 0.25 * rng.standard_normal((n, d)).astype(np.float32))
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-9
    q = x[rng.integers(0, n, 16)] + 0.1 * rng.standard_normal((16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True) + 1e-9
    return x.astype(np.float32), q.astype(np.float32)


def _gt_int8(x, q, k):
    """Brute-force top-k over the SAME int8 quantization the index stores."""
    from tpu_rag.ops.quant import quantize_int8_rows

    v8, s8 = quantize_int8_rows(jnp.asarray(x))
    scores = q @ (np.asarray(v8).astype(np.float32)
                  * np.asarray(s8)[:, None]).T
    return np.argsort(-scores, axis=1)[:, :k]


def _build(x, **kw):
    from tpu_rag.index.host_ivf import HostArenaIVF

    ix = HostArenaIVF(x.shape[1], expected_rows=len(x), **kw)
    ix.train(x[:1024])
    for off in range(0, len(x), 1500):  # multiple add() chunks
        ix.add(x[off:off + 1500])
    return ix


def test_host_ivf_recall_and_overflow_accounting():
    x, q = _mk_corpus()
    k = 10
    ix = _build(x, nlist=32, nprobe=8, cap_factor=1.25)
    # tight cap on clustered data MUST spill; spilled rows stay searchable
    assert ix.spilled_rows > 0
    assert ix.n_rows == len(x)
    sc, rows = ix.search(q, k)
    assert rows.shape == (len(q), k)
    gt = _gt_int8(x, q, k)
    rec = np.mean([len(set(rows[i][rows[i] >= 0].tolist())
                       & set(gt[i].tolist())) / k for i in range(len(q))])
    assert rec >= 0.9, rec
    # scores are real quantized inner products (descending, finite for hits)
    assert np.all(np.diff(sc, axis=1) <= 1e-5)


def test_host_ivf_full_probe_is_exhaustive():
    """nprobe == nlist + overflow == the whole corpus: recall 1.0 vs the
    int8-exact scan (spill accounting leaves no row unreachable)."""
    x, q = _mk_corpus(n=2000)
    k = 5
    ix = _build(x, nlist=16, nprobe=16, cap_factor=1.25)
    sc, rows = ix.search(q, k, mode="exact")
    gt = _gt_int8(x, q, k)
    rec = np.mean([len(set(rows[i].tolist()) & set(gt[i].tolist())) / k
                   for i in range(len(q))])
    assert rec == 1.0, rec


def test_host_ivf_filters():
    x, q = _mk_corpus(n=1000)
    from tpu_rag.index.host_ivf import HostArenaIVF

    ix = HostArenaIVF(x.shape[1], nlist=8, nprobe=8, cap_factor=4.0,
                      expected_rows=len(x))
    ix.train(x[:512])
    ns = (np.arange(len(x)) % 3).astype(np.int32)
    ix.add(x, ns=ns)
    _, rows = ix.search(q, 10, want_ns=1)
    got = rows[rows >= 0]
    assert len(got) and np.all(ns[got] == 1)


def test_host_ivf_save_load_mmap(tmp_path):
    x, q = _mk_corpus(n=1200)
    from tpu_rag.index.host_ivf import HostArenaIVF

    ix = _build(x, nlist=16, nprobe=6, cap_factor=1.25)
    sc0, rows0 = ix.search(q, 8)
    ix.save(str(tmp_path / "hivf"))
    ix2 = HostArenaIVF.load(str(tmp_path / "hivf"), mmap=True)
    assert isinstance(ix2._vec, np.memmap)
    assert ix2.n_rows == ix.n_rows and ix2.spilled_rows == ix.spilled_rows
    sc1, rows1 = ix2.search(q, 8)
    np.testing.assert_array_equal(rows0, rows1)
    np.testing.assert_allclose(sc0, sc1, atol=1e-5)


def test_host_ivf_guards():
    from tpu_rag.index.host_ivf import HostArenaIVF

    ix = HostArenaIVF(16, nlist=4)
    with pytest.raises(RuntimeError):
        ix.add(np.zeros((3, 16), np.float32))
    with pytest.raises(RuntimeError):
        ix.search(np.zeros((1, 16), np.float32), 3)
    x = np.random.default_rng(0).standard_normal((64, 16)).astype(np.float32)
    ix2 = HostArenaIVF(16, nlist=2, cap=128, max_overflow=8)
    ix2.train(x[:32])
    with pytest.raises(RuntimeError):  # overflow bound enforced
        for _ in range(20):
            ix2.add(x)

"""VectorArena: growable RAM/disk-backed host master for index vectors.

Covers the beyond-host-RAM master story (SURVEY.md §7 "streaming ingestion
without full rebuild" / BASELINE config #5 scale): disk spill, zero-copy
adoption of saved stores, and the streamed device-snapshot upload that
replaces the full (n_pad, dim) host staging copy.
"""

import numpy as np
import pytest

from tpu_rag.index.arena import VectorArena
from tpu_rag.index.flat import FlatIndex
from tpu_rag.index.ivf import IVFIndex
from tpu_rag.index.store import load_index, save_index


def _rows(n, dim, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, dim)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_arena_ram_append_growth():
    a = VectorArena(8, backing="ram", initial_rows=4)
    chunks = [_rows(3, 8, s) for s in range(5)]
    for c in chunks:
        a.append(c)
    assert len(a) == 15
    np.testing.assert_array_equal(a.view, np.concatenate(chunks))
    assert a.backing == "ram"


def test_arena_disk_backing_grows_and_cleans_up(tmp_path):
    a = VectorArena(8, backing="disk", dir=tmp_path, initial_rows=4)
    x = _rows(100, 8)
    a.append(x[:50])
    a.append(x[50:])
    assert a.backing == "disk"
    assert a.path is not None and a.path.exists()
    np.testing.assert_array_equal(a.view, x)
    p = a.path
    a.close()
    assert not p.exists()


def test_arena_auto_spills_to_disk(tmp_path):
    # 8 cols * 4 B = 32 B/row; spill threshold 10 rows' worth
    a = VectorArena(8, backing="auto", dir=tmp_path, spill_bytes=10 * 32,
                    initial_rows=4)
    x = _rows(40, 8)
    a.append(x[:8])
    assert a.backing == "ram"
    a.append(x[8:])
    assert a.backing == "disk"          # crossed the threshold -> memmap
    np.testing.assert_array_equal(a.view, x)
    a.append(x[:4])                      # grow the memmap in place
    assert len(a) == 44
    np.testing.assert_array_equal(a.view[40:], x[:4])


def test_arena_adopt_readonly_then_append(tmp_path):
    x = _rows(20, 8)
    f = tmp_path / "base.f32"
    x.tofile(f)
    mm = np.memmap(f, dtype=np.float32, mode="r", shape=(20, 8))
    a = VectorArena(8, backing="ram")
    a.adopt(mm)
    assert len(a) == 20
    np.testing.assert_array_equal(a.view, x)
    extra = _rows(5, 8, seed=9)
    a.append(extra)                      # migrates off the read-only memmap
    assert len(a) == 25
    np.testing.assert_array_equal(a.view[:20], x)
    np.testing.assert_array_equal(a.view[20:], extra)
    assert f.exists()                    # never deletes a file it doesn't own


def test_arena_write_rows_subset(tmp_path):
    a = VectorArena(8, backing="ram")
    x = _rows(30, 8)
    a.append(x)
    out = tmp_path / "sub.f32"
    n = a.write_rows(out, rows=np.array([2, 7, 11]), chunk_rows=2)
    assert n == 3
    got = np.fromfile(out, np.float32).reshape(3, 8)
    np.testing.assert_array_equal(got, x[[2, 7, 11]])


def _search_ids(idx, q, k=5):
    return idx.search(q, k).ids


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_flat_disk_master_matches_ram(tmp_path, dtype):
    dim = 32
    x = _rows(300, dim)
    ids = [f"d{i}" for i in range(300)]
    metas = [{"namespace": "a" if i % 2 else "b"} for i in range(300)]
    ram = FlatIndex(dim, dtype=dtype, use_pallas=False, master_backing="ram")
    dsk = FlatIndex(dim, dtype=dtype, use_pallas=False,
                    master_backing="disk", master_dir=str(tmp_path))
    for idx in (ram, dsk):
        idx.add(ids, x, metadatas=metas)
    assert dsk._arena.backing == "disk"
    q = _rows(4, dim, seed=3)
    assert _search_ids(ram, q) == _search_ids(dsk, q)
    # mutations behave identically on the disk-backed master
    for idx in (ram, dsk):
        idx.delete(ids=ids[:10])
        idx.add(["n1", "n2"], _rows(2, dim, seed=5))
    assert _search_ids(ram, q) == _search_ids(dsk, q)
    assert ram.count() == dsk.count() == 292


def test_store_load_adopts_memmap_zero_copy(tmp_path):
    dim = 16
    x = _rows(50, dim)
    idx = FlatIndex(dim, dtype="float32", use_pallas=False)
    idx.add([f"d{i}" for i in range(50)], x,
            documents=[f"doc {i}" for i in range(50)])
    save_index(idx, tmp_path / "st")
    loaded = load_index(tmp_path / "st", use_pallas=False)
    # the vector file is adopted as a read-only memmap, not read into RAM
    assert isinstance(loaded._arena._buf, np.memmap)
    q = _rows(3, dim, seed=7)
    assert _search_ids(idx, q) == _search_ids(loaded, q)
    # first mutation migrates to a writable backing and keeps working
    loaded.add(["extra"], _rows(1, dim, seed=8))
    assert loaded.count() == 51
    assert loaded.get("extra") is not None


def test_streamed_compact_matches_staged(monkeypatch):
    for dtype in ("bfloat16", "int8", "float32"):
        dim = 32
        x = _rows(700, dim, seed=11)
        ids = [f"d{i}" for i in range(700)]
        metas = [{"namespace": "x" if i % 3 else "y"} for i in range(700)]
        staged = FlatIndex(dim, dtype=dtype, use_pallas=False)
        streamed = FlatIndex(dim, dtype=dtype, use_pallas=False)
        # force the chunked-upload path: tiny byte threshold, small chunks,
        # device refine off (the streamed path only runs without residuals)
        streamed.device_refine = False
        staged.device_refine = False
        streamed.stream_upload_bytes = 1
        streamed.stream_upload_chunk = 256
        for idx in (staged, streamed):
            idx.add(ids, x, metadatas=metas)
        q = _rows(4, dim, seed=12)
        r_staged = staged.search(q, 5, namespace="x")
        r_streamed = streamed.search(q, 5, namespace="x")
        assert streamed.snapshot_stats.get("streamed_uploads", 0) >= 1
        assert r_staged.ids == r_streamed.ids
        np.testing.assert_allclose(
            np.array([s for row in r_staged.similarities for s in row]),
            np.array([s for row in r_streamed.similarities for s in row]),
            rtol=1e-6)
        # incremental append path still works on top of a streamed snapshot
        streamed.add(["tail"], _rows(1, dim, seed=13))
        staged.add(["tail"], _rows(1, dim, seed=13))
        assert staged.search(q, 5).ids == streamed.search(q, 5).ids


def test_ivf_disk_master_smoke(tmp_path):
    dim = 16
    x = _rows(400, dim)
    idx = IVFIndex(dim, dtype="bfloat16", use_pallas=False, nlist=8, nprobe=8,
                   master_backing="disk", master_dir=str(tmp_path))
    idx.add([f"d{i}" for i in range(400)], x)
    res = idx.search(_rows(2, dim, seed=4), 5)
    assert all(len(r) == 5 for r in res.ids)
    assert idx._arena.backing == "disk"


def test_save_over_adopted_memmap_same_path(tmp_path):
    """Persisting back to the path the arena's adopted memmap came from must
    not truncate the file under the live mapping (regression: SIGBUS + a
    destroyed store; save now writes a temp file and renames over)."""
    dim = 16
    x = _rows(40, dim)
    idx = FlatIndex(dim, dtype="float32", use_pallas=False)
    idx.add([f"d{i}" for i in range(40)], x)
    save_index(idx, tmp_path / "st")
    loaded = load_index(tmp_path / "st", use_pallas=False)
    assert isinstance(loaded._arena._buf, np.memmap)  # adopted, not copied
    loaded.delete(ids=["d0"])  # delete-only churn: arena never migrates
    save_index(loaded, tmp_path / "st")  # same path as the adopted memmap
    again = load_index(tmp_path / "st", use_pallas=False)
    assert again.count() == 39
    q = _rows(2, dim, seed=5)
    assert loaded.search(q, 5).ids == again.search(q, 5).ids


def test_streamed_compact_tail_clamp():
    """The final streamed chunk lands past n_pad - chunk: the offset must be
    pinned (dynamic_update_slice clamps silently) — regression for the
    shifted-tail corruption."""
    dim = 32
    n = 5300  # n_pad (5376 at this dim) minus chunk (1000) < last offset
    x = _rows(n, dim, seed=31)
    ids = [f"d{i}" for i in range(n)]
    staged = FlatIndex(dim, dtype="bfloat16", use_pallas=False)
    streamed = FlatIndex(dim, dtype="bfloat16", use_pallas=False)
    for idx in (staged, streamed):
        idx.device_refine = False
    streamed.stream_upload_bytes = 1
    streamed.stream_upload_chunk = 1000
    for idx in (staged, streamed):
        idx.add(ids, x)
    assert streamed.device_snapshot()["n_pad"] % 1000 != 0  # clamp case real
    # query FOR the tail rows specifically: they are the corrupted ones
    q = x[-4:]
    r_staged = staged.search(q, 3)
    r_streamed = streamed.search(q, 3)
    assert r_staged.ids == r_streamed.ids
    assert [r[0] for r in r_streamed.ids] == [f"d{n-4+i}" for i in range(4)]


def test_empty_append_on_adopted_store_is_noop(tmp_path):
    """Appending zero rows to an adopted (read-only) store must not trigger
    the O(n) migration copy."""
    from tpu_rag.index.arena import VectorArena

    src = np.arange(64 * 8, dtype=np.float32).reshape(64, 8)
    a = VectorArena(8, backing="auto")
    mm_path = tmp_path / "rows.f32"
    src.tofile(mm_path)
    mm = np.memmap(mm_path, dtype=np.float32, mode="r", shape=(64, 8))
    a.adopt(mm)
    assert a.append(np.zeros((0, 8), np.float32)) == (64, 64)
    assert a._adopted and a.view.base is not None  # still the adopted memmap
    # a real append migrates as designed
    a.append(np.ones((1, 8), np.float32))
    assert not a._adopted and len(a) == 65


def test_auto_spill_judges_allocated_capacity(tmp_path, monkeypatch):
    """The spill decision uses the capacity about to be allocated: doubling
    growth must not hold ~2x the configured threshold in RAM."""
    from tpu_rag.index.arena import VectorArena

    monkeypatch.setenv("TPU_RAG_MASTER_DIR", str(tmp_path))
    # threshold = 100 rows of dim 8 (3200 B)
    a = VectorArena(8, backing="auto", spill_bytes=100 * 8 * 4,
                    initial_rows=8)
    a.append(np.ones((60, 8), np.float32))
    assert a.backing == "ram"          # cap 60 rows = 1920 B, under threshold
    # needs cap >= 120 rows = 3840 B > threshold: must spill NOW, not after
    # doubling past 2x the knob
    a.append(np.ones((60, 8), np.float32))
    assert a.backing == "disk"
    assert np.allclose(a.view[:120], 1.0)

"""SQLite-backed row store (id/doc/meta) — the beyond-host-RAM companion to
the vector arena: with docmeta_backing="disk" an index holds no per-row
python objects, only the dense scan arrays (tpu_rag/index/rowmeta.py)."""

import numpy as np

from tpu_rag.index.flat import FlatIndex
from tpu_rag.index.rowmeta import RowIdMap, RowSeq
from tpu_rag.index.store import load_index, save_index


def _rows(n, dim, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, dim)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_rowseq_disk_roundtrip(tmp_path):
    s = RowSeq(backing="disk", dir=tmp_path)
    start = s.extend_rows(["a", "b"], ["da", "db"], [{"k": 1}, {}])
    assert start == 0 and len(s) == 2
    assert s.row(1) == ("b", "db", {})
    assert s.rows([1, 0]) == [("b", "db", {}), ("a", "da", {"k": 1})]
    s.append_row("c", "dc", {"k": 3})
    assert [t[1] for t in s.iter_rows(batch=2)] == ["a", "b", "c"]
    # column views
    assert s.ids[2] == "c"
    assert s.docs[[0, 2]] == ["da", "dc"]
    assert list(s.metas) == [{"k": 1}, {}, {"k": 3}]
    # id map shares the sqlite file
    m = RowIdMap(s)
    m.set_many([("a", 0), ("b", 1)])
    m["c"] = 2
    assert m["a"] == 0 and m.get("zz") is None and "b" in m
    assert m.pop("b") == 1 and m.get("b") is None
    path = s.disk.path
    assert path.exists()
    s.disk.close()
    assert not path.exists()  # backing file cleaned up


def test_flat_disk_docmeta_matches_ram(tmp_path):
    dim = 32
    x = _rows(250, dim)
    ids = [f"d{i}" for i in range(250)]
    docs = [f"text {i}" for i in range(250)]
    metas = [{"namespace": "a" if i % 2 else "b", "n": i} for i in range(250)]
    ram = FlatIndex(dim, use_pallas=False)
    dsk = FlatIndex(dim, use_pallas=False, docmeta_backing="disk",
                    master_dir=str(tmp_path))
    for idx in (ram, dsk):
        idx.add(ids, x, docs, metas)
    assert dsk._rowmeta.backing == "disk"
    q = _rows(3, dim, seed=5)
    r_ram, r_dsk = ram.search(q, 5), dsk.search(q, 5)
    assert r_ram.ids == r_dsk.ids
    assert r_ram.documents == r_dsk.documents
    assert r_ram.metadatas == r_dsk.metadatas
    # get / upsert / delete(ids) / delete(where) behave identically
    assert dsk.get("d7")["document"] == "text 7"
    for idx in (ram, dsk):
        idx.add(["d7"], _rows(1, dim, seed=9), ["new 7"], [{"namespace": "a"}])
        idx.delete(ids=["d0", "d1"])
        idx.delete(where={"n": 13})
    assert ram.count() == dsk.count() == 247
    assert dsk.get("d7")["document"] == "new 7"
    assert ram.search(q, 5).ids == dsk.search(q, 5).ids


def test_save_load_disk_docmeta(tmp_path):
    dim = 16
    x = _rows(60, dim)
    src = FlatIndex(dim, dtype="float32", use_pallas=False)
    src.add([f"d{i}" for i in range(60)], x,
            [f"doc {i}" for i in range(60)],
            [{"namespace": "x", "i": i} for i in range(60)])
    src.delete(ids=["d3"])  # live-rows-only save must skip it
    save_index(src, tmp_path / "st")
    loaded = load_index(tmp_path / "st", use_pallas=False,
                        docmeta_backing="disk", master_dir=str(tmp_path))
    assert loaded._rowmeta.backing == "disk"
    assert loaded.count() == 59
    assert loaded.get("d3") is None
    got = loaded.get("d10")
    assert got["document"] == "doc 10" and got["metadata"]["i"] == 10
    q = _rows(2, dim, seed=2)
    assert src.search(q, 5).ids == loaded.search(q, 5).ids
    # mutations after a streamed load keep working
    loaded.add(["zz"], _rows(1, dim, seed=3), ["zdoc"], [{"namespace": "x"}])
    assert loaded.get("zz")["document"] == "zdoc"


def test_vacuum_reclaims_host_rows(tmp_path):
    """Upsert churn must not grow the host master without bound: vacuum
    streams live rows into fresh stores and renumbers."""
    import pytest
    dim = 16
    for backing in ("ram", "disk"):
        idx = FlatIndex(dim, use_pallas=False, docmeta_backing=backing,
                        master_backing=backing, master_dir=str(tmp_path))
        x = _rows(100, dim)
        ids = [f"d{i}" for i in range(100)]
        idx.add(ids, x, [f"doc {i}" for i in range(100)],
                [{"namespace": "a"} for _ in range(100)])
        # churn: re-upsert the first 60 ids twice -> 120 dead rows
        for seed in (1, 2):
            idx.add(ids[:60], _rows(60, dim, seed=seed),
                    [f"doc {i} v{seed}" for i in range(60)],
                    [{"namespace": "a"} for _ in range(60)])
        assert len(idx._rowmeta) == 220 and idx.count() == 100
        q = _rows(3, dim, seed=7)
        idx.auto_vacuum = False
        before = idx.search(q, 5)
        assert len(idx._rowmeta) == 220  # auto off: dead rows retained
        reclaimed = idx.vacuum()
        assert reclaimed == 120
        assert len(idx._rowmeta) == 100 and len(idx._arena) == 100
        after = idx.search(q, 5)
        assert before.ids == after.ids
        assert before.documents == after.documents
        np.testing.assert_allclose(
            [s for r in before.similarities for s in r],
            [s for r in after.similarities for s in r], rtol=1e-6)
        # the current version survived; mutations keep working post-vacuum
        assert idx.get("d0")["document"] == "doc 0 v2"
        assert idx.vacuum() == 0
        idx.add(["post"], _rows(1, dim, seed=9))
        assert idx.count() == 101


def test_vacuum_ivf(tmp_path):
    from tpu_rag.index.ivf import IVFIndex
    dim = 16
    idx = IVFIndex(dim, use_pallas=False, nlist=4, nprobe=4)
    x = _rows(200, dim)
    idx.add([f"d{i}" for i in range(200)], x)
    idx.delete(ids=[f"d{i}" for i in range(50)])
    q = _rows(2, dim, seed=3)
    before = idx.search(q, 5)
    assert idx.vacuum() == 50
    after = idx.search(q, 5)
    assert before.ids == after.ids


def test_auto_vacuum_on_rebuild():
    """Past max_dead_fraction, the next full device rebuild also reclaims
    the host stores automatically."""
    dim = 16
    idx = FlatIndex(dim, use_pallas=False)
    idx.incremental = False  # every mutation forces a full rebuild
    ids = [f"d{i}" for i in range(100)]
    idx.add(ids, _rows(100, dim))
    for seed in (1, 2):  # 120 dead rows -> 0.55 dead fraction
        idx.add(ids[:60], _rows(60, dim, seed=seed))
    q = _rows(2, dim, seed=7)
    res = idx.search(q, 5)
    assert len(idx._rowmeta) == 100  # vacuumed during snapshot rebuild
    assert idx.count() == 100
    assert all(len(r) == 5 for r in res.ids)


def test_concurrent_search_vs_vacuum_churn():
    """Race safety (SURVEY §5): searches run lock-free against snapshots
    while another thread churns upserts/deletes and triggers auto-vacuums.
    Every result must be internally consistent — a hit's id must map to the
    document stored for that id — and nothing may raise."""
    import threading

    dim = 16
    idx = FlatIndex(dim, use_pallas=False)
    idx.incremental = False          # full rebuild (+ possible vacuum) per add
    ids = [f"d{i}" for i in range(200)]
    docs = {i: f"doc {i}" for i in ids}
    idx.add(ids, _rows(200, dim), [docs[i] for i in ids],
            [{"namespace": "a"} for _ in ids])
    stop = threading.Event()
    errors: list = []

    def churn():
        s = 0
        while not stop.is_set():
            s += 1
            sub = ids[(7 * s) % 150:][:40]
            try:
                idx.add(sub, _rows(40, dim, seed=s),
                        [docs[i] for i in sub],
                        [{"namespace": "a"} for _ in sub])
                if s % 3 == 0:
                    idx.delete(ids=[ids[(11 * s) % 200]])
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    def searcher():
        q = _rows(2, dim, seed=99)
        while not stop.is_set():
            try:
                res = idx.search(q, 5)
                for ids_q, docs_q in zip(res.ids, res.documents):
                    for rid, doc in zip(ids_q, docs_q):
                        if docs.get(rid) != doc:
                            errors.append(AssertionError(
                                f"id/doc mismatch: {rid} -> {doc!r}"))
                            return
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    threads = [threading.Thread(target=churn)] + \
        [threading.Thread(target=searcher) for _ in range(2)]
    for t in threads:
        t.start()
    import time as _time
    _time.sleep(4.0)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not errors, errors[:3]
    assert idx.vacuum() >= 0  # index still coherent afterwards


def test_env_knobs_wire_through(monkeypatch, tmp_path):
    """TPU_RAG_MASTER_BACKING / TPU_RAG_DOCMETA_BACKING / TPU_RAG_MASTER_DIR
    reach a default-constructed index (the engine builds indexes without
    explicit kwargs, so the env is the production path)."""
    monkeypatch.setenv("TPU_RAG_MASTER_BACKING", "disk")
    monkeypatch.setenv("TPU_RAG_DOCMETA_BACKING", "disk")
    monkeypatch.setenv("TPU_RAG_MASTER_DIR", str(tmp_path))
    idx = FlatIndex(16, use_pallas=False)
    idx.add(["a", "b"], _rows(2, 16))
    assert idx._arena.backing == "disk"
    assert idx._rowmeta.backing == "disk"
    assert idx._arena.path is not None
    assert str(idx._arena.path).startswith(str(tmp_path))
    assert str(idx._rowmeta.disk.path).startswith(str(tmp_path))


def test_disk_extend_bad_meta_rolls_back(tmp_path):
    """A non-JSON-serializable meta must raise with the store untouched —
    without the rollback, the partial inserts lingered in the shared
    connection's open transaction, got persisted by the next unrelated
    commit, and every later extend collided on the row primary key."""
    import pytest

    s = RowSeq(backing="disk", dir=tmp_path)
    s.extend_rows(["a"], ["da"], [{"k": 1}])
    with pytest.raises(TypeError):
        s.extend_rows(["b", "c"], ["db", "dc"],
                      [{"ok": 2}, {"bad": object()}])
    assert len(s) == 1
    # an unrelated id-map commit must not resurrect the aborted rows
    m = RowIdMap(s)
    m["a"] = 0
    # ... and appending again keeps working with consistent numbering
    start = s.extend_rows(["d"], ["dd"], [{"k": 4}])
    assert start == 1 and s.row(1) == ("d", "dd", {"k": 4})


def test_extend_rows_length_mismatch_raises(tmp_path):
    import pytest

    for backing, kw in (("ram", {}), ("disk", {"dir": tmp_path})):
        s = RowSeq(backing=backing, **kw)
        with pytest.raises(ValueError):
            s.extend_rows(["a", "b"], ["da"], [{}, {}])
        assert len(s) == 0


def test_ram_rows_rejects_negative_row():
    """-1 is flat.py's invalid-row sentinel: the RAM backing must fail loudly
    like disk does instead of silently wrapping to the last row."""
    import pytest

    s = RowSeq(backing="ram")
    s.extend_rows(["a", "b"], ["da", "db"], [{}, {}])
    with pytest.raises(IndexError):
        s.rows([1, -1])
    with pytest.raises(IndexError):
        s.row(-1)

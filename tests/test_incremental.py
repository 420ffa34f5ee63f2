"""Incremental device snapshots: a mutation after the first snapshot must
move O(mutation) rows to the device, not O(corpus) (VERDICT round-1 weak #1;
reference analogue: hnswlib incremental insert, api/app.py:209-225).

rows_uploaded_last / full_rebuilds come from FlatIndex.snapshot_stats."""

import numpy as np
import pytest

from tpu_rag.index.flat import FlatIndex
from tpu_rag.index.ivf import IVFIndex


def _mk(n=3000, d=32, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    metas = [{"namespace": "a" if i % 2 else "b"} for i in range(n)]
    return ids, vecs, metas


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_flat_single_add_uploads_one_row(dtype):
    ids, vecs, metas = _mk()
    idx = FlatIndex(32, dtype=dtype, use_pallas=False)
    idx.add(ids, vecs, None, metas)
    idx.search(vecs[0], 1)  # builds the snapshot
    assert idx.snapshot_stats["full_rebuilds"] == 1
    assert idx.snapshot_stats["rows_uploaded_last"] == 3000

    new = np.ones((1, 32), np.float32)
    idx.add(["fresh"], new, ["doc"], [{"namespace": "a"}])
    res = idx.search(new, 1)
    assert res.ids[0][0] == "fresh"
    assert idx.snapshot_stats["full_rebuilds"] == 1      # no corpus re-upload
    assert idx.snapshot_stats["rows_uploaded_last"] == 1  # O(doc), not O(corpus)
    # old rows still found, filters apply to appended rows
    assert idx.search(vecs[7], 1).ids[0][0] == "v7"
    res = idx.search(new, 1, namespace="b")
    assert res.ids[0][0] != "fresh"


def test_flat_incremental_delete_kills_in_place():
    ids, vecs, metas = _mk()
    idx = FlatIndex(32, dtype="float32", use_pallas=False)
    idx.add(ids, vecs, None, metas)
    idx.search(vecs[0], 1)
    assert idx.search(vecs[42], 1).ids[0][0] == "v42"

    idx.delete(ids=["v42"])
    res = idx.search(vecs[42], 3)
    assert "v42" not in res.ids[0]
    assert len(res.ids[0]) == 3  # neighbors fill the top-k
    assert idx.snapshot_stats["full_rebuilds"] == 1
    assert idx.snapshot_stats["incremental_kills"] == 1


def test_flat_delete_of_appended_row():
    ids, vecs, metas = _mk(500)
    idx = FlatIndex(32, dtype="float32", use_pallas=False)
    idx.add(ids, vecs, None, metas)
    idx.search(vecs[0], 1)
    new = np.full((1, 32), 0.5, np.float32)
    idx.add(["fresh"], new)
    assert idx.search(new, 1).ids[0][0] == "fresh"
    idx.delete(ids=["fresh"])
    assert "fresh" not in idx.search(new, 2).ids[0]
    assert idx.snapshot_stats["full_rebuilds"] == 1


def test_flat_upsert_replaces_incrementally():
    ids, vecs, metas = _mk(400)
    idx = FlatIndex(32, dtype="float32", use_pallas=False)
    idx.add(ids, vecs, None, metas)
    idx.search(vecs[0], 1)
    moved = -vecs[5:6]
    idx.upsert(["v5"], moved, ["moved"], [{}])
    res = idx.search(moved, 1)
    assert res.ids[0][0] == "v5"
    assert res.documents[0][0] == "moved"
    # the old vector no longer matches
    assert idx.search(vecs[5], 1).similarities[0][0] < 0.999
    assert idx.snapshot_stats["full_rebuilds"] == 1


def test_flat_append_overflow_forces_compaction():
    ids, vecs, metas = _mk(300)
    idx = FlatIndex(32, dtype="float32", use_pallas=False)
    idx.append_capacity = 512  # effective slack = 512 - APPEND_GRANULE = 256
    idx.add(ids, vecs, None, metas)
    idx.search(vecs[0], 1)
    big = np.random.default_rng(3).standard_normal((400, 32)).astype(np.float32)
    idx.add([f"bulk{i}" for i in range(400)], big)
    idx.search(big[0], 1)
    assert idx.snapshot_stats["full_rebuilds"] == 2  # block too small -> rebuild
    assert idx.count() == 700


def test_flat_incremental_matches_fresh_rebuild():
    """Search results through the append block + tag kills must equal a
    from-scratch index over the same live rows (exact path, f32)."""
    ids, vecs, metas = _mk(1200, seed=5)
    inc = FlatIndex(32, dtype="float32", use_pallas=False)
    inc.add(ids[:1000], vecs[:1000], None, metas[:1000])
    inc.search(vecs[0], 1)
    inc.add(ids[1000:], vecs[1000:], None, metas[1000:])
    inc.delete(ids=[f"v{i}" for i in range(0, 100, 7)])

    fresh = FlatIndex(32, dtype="float32", use_pallas=False)
    alive = [i for i in range(1200) if not (i < 100 and i % 7 == 0)]
    fresh.add([ids[i] for i in alive], vecs[alive], None, [metas[i] for i in alive])

    rng = np.random.default_rng(9)
    qs = rng.standard_normal((16, 32)).astype(np.float32)
    a = inc.search(qs, 5)
    b = fresh.search(qs, 5)
    assert a.ids == b.ids
    np.testing.assert_allclose(np.array(a.similarities), np.array(b.similarities),
                               rtol=1e-5, atol=1e-5)


def test_ivf_add_after_snapshot_skips_main_reupload():
    ids, vecs, metas = _mk(2000, seed=2)
    ivf = IVFIndex(32, dtype="float32", nlist=16, nprobe=16, use_pallas=False)
    ivf.add(ids, vecs, None, metas)
    ivf.search(vecs[0], 1)
    assert ivf.snapshot_stats["full_rebuilds"] == 1

    new = np.full((1, 32), 0.7, np.float32)
    ivf.add(["fresh"], new, ["d"], [{"namespace": "a"}])
    assert ivf.search(new, 1).ids[0][0] == "fresh"
    assert ivf.snapshot_stats["full_rebuilds"] == 1
    assert ivf.snapshot_stats["rows_uploaded_last"] == 1
    # existing rows unaffected
    assert ivf.search(vecs[123], 1).ids[0][0] == "v123"


def test_ivf_delete_main_row_tag_kill():
    ids, vecs, metas = _mk(1500, seed=4)
    ivf = IVFIndex(32, dtype="float32", nlist=12, nprobe=12, use_pallas=False)
    ivf.add(ids, vecs, None, metas)
    ivf.search(vecs[0], 1)
    assert ivf.search(vecs[99], 1).ids[0][0] == "v99"
    ivf.delete(ids=["v99"])
    res = ivf.search(vecs[99], 3)
    assert "v99" not in res.ids[0]
    assert len(res.ids[0]) == 3
    assert ivf.snapshot_stats["full_rebuilds"] == 1
    # compaction reclaims and still excludes the row
    ivf.compact()
    assert "v99" not in ivf.search(vecs[99], 3).ids[0]
    assert ivf.snapshot_stats["full_rebuilds"] == 2


def test_ivf_incremental_matches_fresh_rebuild():
    ids, vecs, metas = _mk(1000, seed=6)
    inc = IVFIndex(32, dtype="float32", nlist=8, nprobe=8, use_pallas=False)
    inc.add(ids[:800], vecs[:800], None, metas[:800])
    inc.search(vecs[0], 1)
    inc.add(ids[800:], vecs[800:], None, metas[800:])
    inc.delete(ids=["v3", "v801", "v500"])

    fresh = IVFIndex(32, dtype="float32", nlist=8, nprobe=8, use_pallas=False)
    alive = [i for i in range(1000) if i not in (3, 801, 500)]
    fresh.add([ids[i] for i in alive], vecs[alive], None, [metas[i] for i in alive])
    # same centroids so probes agree (fresh would otherwise re-train k-means)
    fresh._cached_centroids = inc._cached_centroids
    fresh._centroids_trained_n = inc._centroids_trained_n

    rng = np.random.default_rng(10)
    qs = rng.standard_normal((8, 32)).astype(np.float32)
    a = inc.search(qs, 5)
    b = fresh.search(qs, 5)
    assert a.ids == b.ids


def test_int8_refine_recall_gate():
    """BASELINE quality bar: int8 storage (0.25x f32 memory) + two-stage f32
    refine must hold recall@10 >= 0.99 vs exact f32 on clustered data."""
    rng = np.random.default_rng(0)
    n, d, k = 20_000, 128, 10
    centers = rng.standard_normal((64, d)).astype(np.float32)
    x = (centers[rng.integers(0, 64, n)]
         + 0.25 * rng.standard_normal((n, d))).astype(np.float32)
    q = (centers[rng.integers(0, 64, 24)]
         + 0.25 * rng.standard_normal((24, d))).astype(np.float32)
    ids = [str(i) for i in range(n)]
    exact = FlatIndex(d, dtype="float32", use_pallas=False)
    exact.add(ids, x)
    for dtype in ("int8", "bfloat16"):
        idx = FlatIndex(d, dtype=dtype, use_pallas=False)
        idx.add(ids, x)
        gt = exact.search(q, k)
        r = idx.search(q, k)
        rec = np.mean([len(set(r.ids[i]) & set(gt.ids[i])) / k
                       for i in range(len(q))])
        assert rec >= 0.99, f"{dtype} recall@10 {rec:.4f} below the 0.99 bar"


def test_ivf_device_merge_absorbs_overflow():
    """Streaming build: after the first build, new rows are merged into the
    resident device lists (assignment + scatter, O(new) transfers) instead
    of re-uploading the main partition or waiting for a full rebuild."""
    ids, vecs, metas = _mk(2000, seed=8)
    ivf = IVFIndex(32, dtype="float32", nlist=16, nprobe=4, use_pallas=False)
    ivf.add(ids, vecs, None, metas)
    ivf.search(vecs[0], 1)  # first snapshot: full build
    rng = np.random.default_rng(9)
    newv = rng.standard_normal((100, 32)).astype(np.float32)
    ivf.add([f"n{i}" for i in range(100)], newv, None,
            [{"namespace": "a"}] * 100)
    ivf.compact()
    ivf.device_snapshot()  # compact() only marks dirty; merge runs here
    merges = ivf.snapshot_stats.get("ivf_device_merges", 0)
    assert merges >= 90, f"device merge absorbed only {merges}/100 rows"
    # merged rows are found through the PROBE path (their assignment
    # centroid is the query's top-1 for an identical vector)
    assert ivf.search(newv[7], 1).ids[0][0] == "n7"
    assert ivf.search(newv[63], 1).ids[0][0] == "n63"
    # and they are no longer exact-overflow rows
    snap = ivf.device_snapshot()
    n7_row = ivf._id_to_row["n7"]
    assert n7_row not in set(snap["ov_rows"].tolist())
    assert ivf._main_slot_of[n7_row] >= 0  # member of the main partition
    # old rows unaffected
    assert ivf.search(vecs[123], 1).ids[0][0] == "v123"


def test_ivf_device_merge_capacity_spill_stays_searchable():
    """Rows that find no spare list slot stay in the exact overflow buffer
    and remain exactly searchable."""
    ids, vecs, metas = _mk(1200, seed=11)
    ivf = IVFIndex(32, dtype="float32", nlist=8, nprobe=8, use_pallas=False,
                   list_cap_factor=0.6)  # lists mostly full from the start
    ivf.add(ids, vecs, None, metas)
    ivf.search(vecs[0], 1)
    rng = np.random.default_rng(12)
    newv = rng.standard_normal((64, 32)).astype(np.float32)
    ivf.add([f"s{i}" for i in range(64)], newv, None, [{}] * 64)
    ivf.compact()
    for i in (0, 13, 63):
        assert ivf.search(newv[i], 1).ids[0][0] == f"s{i}"


def test_ivf_delete_of_device_merged_row():
    ids, vecs, metas = _mk(1500, seed=13)
    ivf = IVFIndex(32, dtype="float32", nlist=12, nprobe=12, use_pallas=False)
    ivf.add(ids, vecs, None, metas)
    ivf.search(vecs[0], 1)
    new = np.full((1, 32), 0.31, np.float32)
    ivf.add(["m0"], new, ["d"], [{}])
    ivf.compact()  # m0 merged into a device list
    assert ivf.search(new, 1).ids[0][0] == "m0"
    ivf.delete(ids=["m0"])
    res = ivf.search(new, 3)
    assert "m0" not in res.ids[0] and len(res.ids[0]) == 3


def test_ivf_device_merge_int8():
    ids, vecs, metas = _mk(1500, seed=14)
    ivf = IVFIndex(32, dtype="int8", nlist=12, nprobe=6, use_pallas=False)
    ivf.add(ids, vecs, None, metas)
    ivf.search(vecs[0], 1)
    rng = np.random.default_rng(15)
    newv = rng.standard_normal((40, 32)).astype(np.float32)
    ivf.add([f"q{i}" for i in range(40)], newv, None, [{}] * 40)
    ivf.compact()
    ivf.device_snapshot()
    assert ivf.snapshot_stats.get("ivf_device_merges", 0) >= 35
    for i in (0, 21, 39):
        assert ivf.search(newv[i], 1).ids[0][0] == f"q{i}"


def test_ivf_host_bookkeeping_is_one_int32_map():
    """ROADMAP host-RAM item: per-row IVF bookkeeping must be exactly one
    dense int32 slot map (4 bytes/row) — membership is derived from it, so
    there is no separate row-list array to double the footprint."""
    ids, vecs, metas = _mk(1500, seed=16)
    ivf = IVFIndex(32, dtype="float32", nlist=12, nprobe=12, use_pallas=False)
    ivf.add(ids, vecs, None, metas)
    ivf.search(vecs[0], 1)
    assert not hasattr(ivf, "_main_rows")
    assert ivf._main_slot_of.dtype == np.int32
    # main membership derived from the map covers (almost) the whole corpus
    in_main = np.flatnonzero(ivf._main_slot_of >= 0)
    assert len(in_main) >= 1400

    # device-merge path extends the map, still int32
    new = np.full((3, 32), 0.42, np.float32)
    ivf.add(["a0", "a1", "a2"], new, None, [{}] * 3)
    ivf.compact()
    assert ivf._main_slot_of.dtype == np.int32
    # delete AFTER compact(): _note_dead stages nothing once _dirty is set,
    # so the kill must come from the reuse-path dead-main sweep in _compact
    # (this sequence silently resurrected deleted rows before the sweep)
    ivf.delete(ids=["v7"])
    assert "v7" not in ivf.search(vecs[7], 3).ids[0]
    # the post-compact() snapshot reused the device lists (no k-means rerun)
    assert ivf.snapshot_stats.get("ivf_device_merges", 0) >= 3


def test_ivf_dead_main_swept_once_across_reuse_snapshots():
    """The reuse-path dead sweep drops swept rows from the slot map, so a
    long-lived index under churn doesn't re-upload every accumulated
    tombstone on each reuse compact."""
    ids, vecs, metas = _mk(1500, seed=17)
    ivf = IVFIndex(32, dtype="float32", nlist=12, nprobe=12, use_pallas=False)
    ivf.add(ids, vecs, None, metas)
    ivf.search(vecs[0], 1)
    ivf.compact()                      # _dirty: kills below are NOT staged
    ivf.delete(ids=["v5", "v6"])
    assert "v5" not in ivf.search(vecs[5], 3).ids[0]  # reuse-path sweep
    r5, r6 = 5, 6
    assert ivf._main_slot_of[r5] == -1 and ivf._main_slot_of[r6] == -1
    ivf.compact()
    assert "v5" not in ivf.search(vecs[5], 3).ids[0]  # still dead, not re-swept
    # incremental kill path also drops the slot
    ivf.delete(ids=["v8"])
    assert "v8" not in ivf.search(vecs[8], 3).ids[0]
    assert ivf._main_slot_of[8] == -1

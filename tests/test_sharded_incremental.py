"""Incremental mutation on SHARDED indexes (VERDICT r2 missing #1/#2):
one /docs/save against a sharded corpus must transfer O(doc), not re-upload
the corpus; deletions tag-kill in place inside the sharded arrays; and the
sharded IVF build must not materialize the padded corpus in host RAM
(reference analogue: hnswlib inserts into a live index in place,
reference api/app.py:209-225).

Runs on the 8-device virtual CPU mesh (conftest.py)."""

import numpy as np
import pytest

from tpu_rag.parallel import ShardedFlatIndex, ShardedIVFIndex, mesh_from_spec


def _mk(n=3000, d=32, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    metas = [{"namespace": "a" if i % 2 else "b"} for i in range(n)]
    return ids, vecs, metas


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_sharded_flat_single_add_uploads_one_row(dtype):
    ids, vecs, metas = _mk()
    idx = ShardedFlatIndex(32, dtype=dtype, use_pallas=False,
                           mesh=mesh_from_spec("data:8"))
    idx.add(ids, vecs, None, metas)
    idx.search(vecs[0], 1)  # builds the sharded snapshot
    assert idx.snapshot_stats["full_rebuilds"] == 1
    assert idx.snapshot_stats["rows_uploaded_last"] == 3000

    new = np.ones((1, 32), np.float32)
    idx.add(["fresh"], new, ["doc"], [{"namespace": "a"}])
    res = idx.search(new, 1)
    assert res.ids[0][0] == "fresh"
    assert idx.snapshot_stats["full_rebuilds"] == 1       # no corpus re-shard
    assert idx.snapshot_stats["rows_uploaded_last"] == 1  # O(doc) transfer
    # old rows still found; filters apply to appended rows
    assert idx.search(vecs[7], 1).ids[0][0] == "v7"
    assert idx.search(new, 1, namespace="b").ids[0][0] != "fresh"


def test_sharded_flat_delete_kills_in_place():
    ids, vecs, metas = _mk()
    idx = ShardedFlatIndex(32, dtype="float32", use_pallas=False,
                           mesh=mesh_from_spec("data:8"))
    idx.add(ids, vecs, None, metas)
    idx.search(vecs[0], 1)
    assert idx.search(vecs[42], 1).ids[0][0] == "v42"

    idx.delete(ids=["v42"])
    res = idx.search(vecs[42], 3)
    assert "v42" not in res.ids[0]
    assert len(res.ids[0]) == 3  # neighbors fill the top-k
    assert idx.snapshot_stats["full_rebuilds"] == 1
    assert idx.snapshot_stats["incremental_kills"] == 1
    # the kill hit the correct shard-local position: every other row intact
    assert idx.search(vecs[41], 1).ids[0][0] == "v41"
    assert idx.search(vecs[43], 1).ids[0][0] == "v43"


def test_sharded_flat_incremental_matches_fresh_rebuild():
    """Search through append block + sharded tag kills must equal a
    from-scratch sharded index over the same live rows."""
    ids, vecs, metas = _mk(1600, seed=5)
    mesh = mesh_from_spec("data:8")
    inc = ShardedFlatIndex(32, dtype="float32", use_pallas=False, mesh=mesh)
    inc.add(ids[:1400], vecs[:1400], None, metas[:1400])
    inc.search(vecs[0], 1)
    inc.add(ids[1400:], vecs[1400:], None, metas[1400:])
    inc.delete(ids=[f"v{i}" for i in range(0, 100, 7)])

    fresh = ShardedFlatIndex(32, dtype="float32", use_pallas=False, mesh=mesh)
    alive = [i for i in range(1600) if not (i < 100 and i % 7 == 0)]
    fresh.add([ids[i] for i in alive], vecs[alive], None,
              [metas[i] for i in alive])

    rng = np.random.default_rng(9)
    qs = rng.standard_normal((16, 32)).astype(np.float32)
    a = inc.search(qs, 5)
    b = fresh.search(qs, 5)
    assert a.ids == b.ids
    np.testing.assert_allclose(np.array(a.similarities),
                               np.array(b.similarities), rtol=1e-5, atol=1e-5)
    assert inc.snapshot_stats["full_rebuilds"] == 1


def test_sharded_flat_multiaxis_mesh_mutation():
    """Incremental add/delete also works on a data x model mesh (rows
    sharded over 'data' only, replicated over 'model')."""
    ids, vecs, metas = _mk(1200, seed=7)
    idx = ShardedFlatIndex(32, dtype="float32", use_pallas=False,
                           mesh=mesh_from_spec("data:4,model:2"))
    idx.add(ids, vecs, None, metas)
    idx.search(vecs[0], 1)
    idx.add(["fresh"], np.ones((1, 32), np.float32))
    idx.delete(ids=["v10"])
    assert idx.search(np.ones((1, 32), np.float32), 1).ids[0][0] == "fresh"
    assert "v10" not in idx.search(vecs[10], 3).ids[0]
    assert idx.snapshot_stats["full_rebuilds"] == 1


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_sharded_ivf_add_after_snapshot_skips_reupload(dtype):
    ids, vecs, metas = _mk(2000, seed=2)
    ivf = ShardedIVFIndex(32, dtype=dtype, nlist=16, nprobe=16,
                          use_pallas=False, mesh=mesh_from_spec("data:8"))
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


def test_sharded_ivf_delete_main_row_tag_kill():
    ids, vecs, metas = _mk(1500, seed=4)
    ivf = ShardedIVFIndex(32, dtype="float32", nlist=12, nprobe=12,
                          use_pallas=False, mesh=mesh_from_spec("data:8"))
    ivf.add(ids, vecs, None, metas)
    ivf.search(vecs[0], 1)
    assert ivf.search(vecs[99], 1).ids[0][0] == "v99"
    ivf.delete(ids=["v99"])
    res = ivf.search(vecs[99], 3)
    assert "v99" not in res.ids[0]
    assert len(res.ids[0]) == 3
    assert ivf.snapshot_stats["full_rebuilds"] == 1
    # neighbors intact (the sharded kill only touched one slot)
    assert ivf.search(vecs[98], 1).ids[0][0] == "v98"
    # compaction reclaims and still excludes the row
    ivf.compact()
    assert "v99" not in ivf.search(vecs[99], 3).ids[0]
    assert ivf.snapshot_stats["full_rebuilds"] == 2


def test_sharded_ivf_delete_overflow_row():
    """Rows living in the sharded exact-overflow block are killable in
    place too (tiny list cap forces spills)."""
    ids, vecs, metas = _mk(1200, seed=11)
    ivf = ShardedIVFIndex(32, dtype="float32", nlist=8, nprobe=8,
                          use_pallas=False, list_cap_factor=0.6,
                          mesh=mesh_from_spec("data:8"))
    ivf.add(ids, vecs, None, metas)
    ivf.search(vecs[0], 1)
    ov_rows = [r for r in range(1200) if ivf._s_ov_of[r] >= 0]
    assert ov_rows, "expected spilled rows with cap_factor=0.6"
    victim = ov_rows[0]
    assert ivf.search(vecs[victim], 1).ids[0][0] == f"v{victim}"
    ivf.delete(ids=[f"v{victim}"])
    assert f"v{victim}" not in ivf.search(vecs[victim], 3).ids[0]
    assert ivf.snapshot_stats["full_rebuilds"] == 1


def test_sharded_ivf_incremental_matches_rebuild():
    ids, vecs, metas = _mk(1000, seed=6)
    mesh = mesh_from_spec("data:8")
    inc = ShardedIVFIndex(32, dtype="float32", nlist=8, nprobe=8,
                          use_pallas=False, mesh=mesh)
    inc.add(ids[:800], vecs[:800], None, metas[:800])
    inc.search(vecs[0], 1)
    inc.add(ids[800:], vecs[800:], None, metas[800:])
    inc.delete(ids=["v3", "v801", "v500"])

    fresh = ShardedIVFIndex(32, dtype="float32", nlist=8, nprobe=8,
                            use_pallas=False, mesh=mesh)
    alive = [i for i in range(1000) if i not in (3, 801, 500)]
    fresh.add([ids[i] for i in alive], vecs[alive], None,
              [metas[i] for i in alive])
    # same centroids so probes agree
    fresh._cached_centroids = inc._cached_centroids
    fresh._centroids_trained_n = inc._centroids_trained_n

    rng = np.random.default_rng(10)
    qs = rng.standard_normal((8, 32)).astype(np.float32)
    a = inc.search(qs, 5)
    b = fresh.search(qs, 5)
    assert a.ids == b.ids


def test_sharded_ivf_build_host_ram_bounded():
    """VERDICT r2 next #3: the sharded IVF build must NOT materialize the
    padded (d_ax, nlist, cap, dim) f32 corpus in host RAM.  tracemalloc
    tracks numpy/host allocations (XLA device buffers are invisible to it,
    which is exactly the split we want): peak host allocation during the
    build must stay O(n / d_ax), far below the padded-corpus size the old
    build allocated."""
    import tracemalloc

    rng = np.random.default_rng(3)
    n, d, d_ax = 40_000, 64, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    ivf = ShardedIVFIndex(d, dtype="float32", nprobe=8, use_pallas=False,
                          kmeans_sample=2048, assign_chunk=4096,
                          mesh=mesh_from_spec("data:8"))
    ivf.add(ids, vecs)

    # warm build first: jit COMPILATION allocates host memory tracemalloc
    # would otherwise attribute to the build (the standalone-run flake);
    # the bounded claim is about the steady-state build DATA path
    ivf.device_snapshot()
    ivf.compact()  # force a full rebuild for the measured pass

    tracemalloc.start()
    tracemalloc.reset_peak()
    ivf.device_snapshot()  # the build
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    shard_bytes = (n // d_ax) * d * 4
    # old build: >= 1.5 * n * d * 4 = 15.4 MB of padded f32 lists + the full
    # xs copy (10.2 MB); new bound: a few shard-sized temporaries
    budget = 4 * shard_bytes + (1 << 20)
    assert peak < budget, f"host peak {peak/1e6:.1f}MB > {budget/1e6:.1f}MB"
    # and the build is correct
    r = ivf.search(vecs[17], 1)
    assert r.ids[0][0] == "v17"


@pytest.mark.parametrize("dtype", ["int8", "bfloat16"])
def test_sharded_flat_build_host_ram_bounded(dtype):
    """Same host-RAM bound for the sharded FLAT build: the old path staged
    the whole padded (n_pad, dim) f32 corpus (plus a full int8 quantize
    staging copy) on host; the streamed build materializes one device's
    block at a time, so peak host allocation is O(n / d_ax)."""
    import tracemalloc

    rng = np.random.default_rng(5)
    n, d, d_ax = 40_000, 64, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    idx = ShardedFlatIndex(d, dtype=dtype, use_pallas=False,
                           mesh=mesh_from_spec("data:8"))
    idx.add(ids, vecs)

    idx.device_snapshot()  # warm: jit compile allocs stay out of the window
    idx.compact()

    tracemalloc.start()
    tracemalloc.reset_peak()
    idx.device_snapshot()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    shard_bytes = (n // d_ax) * d * 4
    budget = 4 * shard_bytes + (1 << 20)
    assert peak < budget, f"host peak {peak/1e6:.1f}MB > {budget/1e6:.1f}MB"
    r = idx.search(vecs[23], 1)
    assert r.ids[0][0] == "v23"


@pytest.mark.parametrize("cls", [ShardedFlatIndex, ShardedIVFIndex])
def test_sharded_vacuum_churn_parity(cls):
    """Vacuum renumbers host rows under a SHARDED index: the next snapshot
    must rebuild from the renumbered store and search results must match a
    fresh index over the same live set (kill maps carry old row numbers —
    they must not leak into the post-vacuum snapshot)."""
    ids, vecs, metas = _mk(2400, seed=21)
    kw = dict(dtype="float32", use_pallas=False, mesh=mesh_from_spec("data:8"))
    if cls is ShardedIVFIndex:
        kw.update(nprobe=64, kmeans_sample=1024)
    idx = cls(32, **kw)
    idx.add(ids, vecs, None, metas)
    idx.search(vecs[0], 1)
    # churn: delete a slice, add replacements, delete some of those too
    idx.delete(ids=[f"v{i}" for i in range(0, 600, 3)])
    rng = np.random.default_rng(22)
    newv = rng.standard_normal((64, 32)).astype(np.float32)
    idx.add([f"n{i}" for i in range(64)], newv, None, [{} for _ in range(64)])
    idx.delete(ids=["n0", "n63"])
    reclaimed = idx.vacuum()
    assert reclaimed == 202

    fresh = cls(32, **kw)
    alive = [i for i in range(2400) if not (i < 600 and i % 3 == 0)]
    fresh.add([ids[i] for i in alive], vecs[alive], None,
              [metas[i] for i in alive])
    keep = [i for i in range(64) if i not in (0, 63)]
    fresh.add([f"n{i}" for i in keep], newv[keep], None,
              [{} for _ in keep])
    if cls is ShardedIVFIndex:
        fresh._cached_centroids = idx._cached_centroids
        fresh._centroids_trained_n = idx._centroids_trained_n

    qs = rng.standard_normal((8, 32)).astype(np.float32)
    a = idx.search(qs, 5)
    b = fresh.search(qs, 5)
    assert a.ids == b.ids
    # incremental mutation still works after the renumbering
    probe = np.full((1, 32), 0.9, np.float32)
    idx.add(["post"], probe, ["d"], [{}])
    assert idx.search(probe, 1).ids[0][0] == "post"
    idx.delete(ids=["post"])
    assert "post" not in idx.search(probe, 2).ids[0]

"""Multi-device sharded search tests on the 8-device virtual CPU mesh
(SURVEY.md §4: xla_force_host_platform_device_count, no pod needed)."""

import numpy as np

import jax

from tpu_rag.index import FlatIndex
from tpu_rag.parallel import ShardedFlatIndex, mesh_from_spec


def test_mesh_from_spec():
    m = mesh_from_spec("")
    assert m.shape["data"] == len(jax.devices())
    m2 = mesh_from_spec("data:4,model:2")
    assert m2.shape == {"data": 4, "model": 2}


def test_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    n, d = 4000, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    metas = [{"namespace": ["a", "b"][i % 2]} for i in range(n)]

    flat = FlatIndex(d, dtype="float32", use_pallas=False)
    flat.add(ids, vecs, metadatas=metas)
    sharded = ShardedFlatIndex(d, dtype="float32", use_pallas=False,
                               mesh=mesh_from_spec("data:8"))
    sharded.add(ids, vecs, metadatas=metas)

    q = rng.standard_normal((3, d)).astype(np.float32)
    r1 = flat.search(q, 10)
    r2 = sharded.search(q, 10)
    assert r1.ids == r2.ids
    for a, b in zip(r1.similarities, r2.similarities):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_sharded_filter():
    rng = np.random.default_rng(1)
    n, d = 2000, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    metas = [{"namespace": ["a", "b"][i % 2]} for i in range(n)]
    sharded = ShardedFlatIndex(d, dtype="float32", use_pallas=False,
                               mesh=mesh_from_spec("data:8"))
    sharded.add(ids, vecs, metadatas=metas)
    res = sharded.search(vecs[0], 10, namespace="b")
    assert all(m["namespace"] == "b" for m in res.metadatas[0])
    assert len(res.ids[0]) == 10


def test_sharded_pallas_interpret():
    """Pallas kernel inside shard_map (interpret mode on CPU devices)."""
    rng = np.random.default_rng(2)
    n, d = 1000, 128
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    flat = FlatIndex(d, dtype="float32", use_pallas=False)
    flat.add(ids, vecs)
    sharded = ShardedFlatIndex(d, dtype="float32", use_pallas=True,
                               mesh=mesh_from_spec("data:8"))
    sharded.add(ids, vecs)
    q = rng.standard_normal((2, d)).astype(np.float32)
    assert sharded.search(q, 5).ids == flat.search(q, 5).ids


def test_sharded_int8():
    rng = np.random.default_rng(3)
    n, d = 1500, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    exact = FlatIndex(d, dtype="float32", use_pallas=False)
    exact.add(ids, vecs)
    sharded8 = ShardedFlatIndex(d, dtype="int8", use_pallas=False,
                                mesh=mesh_from_spec("data:8"))
    sharded8.add(ids, vecs)
    q = rng.standard_normal((2, d)).astype(np.float32)
    truth = exact.search(q, 10)
    got = sharded8.search(q, 10)
    recalls = [len(set(a) & set(b)) / 10 for a, b in zip(truth.ids, got.ids)]
    assert np.mean(recalls) >= 0.9  # int8 quantization tolerance


def test_sharded_bucketed_mode():
    # bucketed yields one candidate per 128 rows; each shard must hold
    # >> 128*k rows for top-k recall (documented in ops/topk.py)
    rng = np.random.default_rng(9)
    n, d = 32768, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    exact = FlatIndex(d, dtype="float32", use_pallas=False)
    exact.add(ids, vecs)
    sb = ShardedFlatIndex(d, dtype="float32", use_pallas=True,
                          mesh=mesh_from_spec("data:8"), search_mode="bucketed")
    sb.add(ids, vecs)
    q = rng.standard_normal((2, d)).astype(np.float32)
    truth = exact.search(q, 10)
    got = sb.search(q, 10)
    recalls = [len(set(a) & set(b)) / 10 for a, b in zip(truth.ids, got.ids)]
    assert np.mean(recalls) >= 0.9


def test_sharded_int8_refine():
    rng = np.random.default_rng(21)
    n, d = 3000, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    exact = FlatIndex(d, dtype="float32", use_pallas=False)
    exact.add(ids, vecs)
    s8 = ShardedFlatIndex(d, dtype="int8", use_pallas=False,
                          mesh=mesh_from_spec("data:8"))
    assert s8.refine_factor > 0  # inherited default
    s8.add(ids, vecs)
    q = rng.standard_normal((3, d)).astype(np.float32)
    truth = exact.search(q, 10)
    got = s8.search(q, 10)
    rec = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(truth.ids, got.ids)])
    assert rec >= 0.95


def test_sharded_auto_mode_resolves_per_data_axis_shard():
    """"auto" must divide by the DATA axis size, not the total device count:
    on a data:2 x model:4 mesh each shard holds n/2 rows, and the routing
    decision has to see that (regression for the multi-axis-mesh bug)."""
    rng = np.random.default_rng(21)
    n, d = 3072, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    sb = ShardedFlatIndex(d, dtype="float32", use_pallas=False,
                          mesh=mesh_from_spec("data:2,model:4"))
    # threshold between n/2 (=1536, per-shard rows) and n/8 (=384, the buggy
    # total-device division): correct routing picks bucketed, buggy exact
    sb.auto_bucketed_min_rows = 1000
    sb.add(ids, vecs)
    res = sb.search(vecs[5], 3)
    assert res.ids[0][0] == "v5"
    modes = {key[1] for key in sb._search_fns}
    assert modes == {"bucketed"}, modes

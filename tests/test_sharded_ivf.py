"""ShardedIVFIndex: per-shard inverted lists over the mesh "data" axis with
all-gather top-k merge (BASELINE config #5 layout: int8 IVF shards with
metadata filters).  Runs on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax

from tpu_rag.index.flat import FlatIndex
from tpu_rag.parallel.mesh import mesh_from_spec
from tpu_rag.parallel.sharded import ShardedIVFIndex

pytestmark = pytest.mark.skipif(jax.device_count() < 2,
                                reason="needs a multi-device mesh")


def _corpus(n=4000, d=64, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((32, d))
    x = (centers[rng.integers(0, 32, n)] + 0.3 * rng.standard_normal((n, d))).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    metas = [{"namespace": "even" if i % 2 == 0 else "odd"} for i in range(n)]
    return ids, x, metas


def _mk(dtype="float32", nprobe=32, use_pallas=False, n=4000):
    ids, x, metas = _corpus(n=n)
    mesh = mesh_from_spec("")
    idx = ShardedIVFIndex(x.shape[1], mesh=mesh, dtype=dtype, nlist=32,
                          nprobe=nprobe, use_pallas=use_pallas)
    idx.add(ids, x, [f"doc {i}" for i in range(len(ids))], metas)
    return idx, x


def test_full_probe_matches_exact():
    """nprobe == nlist probes every list -> exhaustive -> equals FlatIndex."""
    idx, x = _mk(nprobe=32)
    flat = FlatIndex(x.shape[1], dtype="float32", use_pallas=False)
    ids, _, metas = _corpus()
    flat.add(ids, x, [f"doc {i}" for i in range(len(ids))], metas)
    rng = np.random.default_rng(1)
    qs = x[rng.integers(0, len(x), 8)] + 0.01 * rng.standard_normal((8, x.shape[1])).astype(np.float32)
    a = idx.search(qs, 5)
    b = flat.search(qs, 5)
    assert a.ids == b.ids


def test_partial_probe_recall():
    idx, x = _mk(nprobe=8)
    flat = FlatIndex(x.shape[1], dtype="float32", use_pallas=False)
    ids, _, metas = _corpus()
    flat.add(ids, x, None, metas)
    rng = np.random.default_rng(2)
    qs = x[rng.integers(0, len(x), 16)]
    a = idx.search(qs, 10)
    b = flat.search(qs, 10)
    recall = np.mean([len(set(a.ids[i]) & set(b.ids[i])) / 10 for i in range(16)])
    assert recall >= 0.9, recall


def test_metadata_filter_inside_shards():
    idx, x = _mk(nprobe=32)
    res = idx.search(x[:4], 8, namespace="even")
    for hits_m in res.metadatas:
        assert hits_m, "filter returned nothing"
        assert all(m["namespace"] == "even" for m in hits_m)
    # unseen tag -> no hits
    res = idx.search(x[:1], 3, namespace="nope")
    assert res.ids == [[]]


def test_int8_shards_with_refine():
    idx, x = _mk(dtype="int8", nprobe=32)
    flat = FlatIndex(x.shape[1], dtype="float32", use_pallas=False)
    ids, _, metas = _corpus()
    flat.add(ids, x, None, metas)
    rng = np.random.default_rng(3)
    qs = x[rng.integers(0, len(x), 12)]
    a = idx.search(qs, 10)
    b = flat.search(qs, 10)
    recall = np.mean([len(set(a.ids[i]) & set(b.ids[i])) / 10 for i in range(12)])
    assert recall >= 0.95, recall


def test_pallas_interpret_probe_on_mesh():
    """The scalar-prefetch Pallas probe runs per shard under shard_map
    (interpret mode on CPU)."""
    idx, x = _mk(nprobe=4, use_pallas=True, n=1024)
    res = idx.search(x[:2], 3)
    assert res.ids[0][0] == "v0"


def test_self_query_returns_self():
    idx, x = _mk(nprobe=8)
    res = idx.search(x[123], 1)
    assert res.ids[0][0] == "v123"
    assert res.similarities[0][0] > 0.999

"""Engine-level IVF config + int8 dtype e2e (through the HTTP surface)."""

import numpy as np
import pytest

from tpu_rag.api.app import create_app
from tpu_rag.api.testclient import TestClient
from tpu_rag.config import Config
from tpu_rag.engine import RagEngine
from tpu_rag.index import IVFIndex

from tests.test_api import FakeEncoder, ScriptedBackend, ScriptedDispatcher


def _engine(tmp_path, **cfg_kw):
    cfg = Config(
        persist_dir=str(tmp_path / "vs"),
        kb_db_path=str(tmp_path / "db/kb.sqlite3"),
        db_path=str(tmp_path / "db/app.sqlite3"),
        docs_dir=str(tmp_path / "docs"),
        use_pallas=False,
        summarize_mode="off",
        **cfg_kw,
    )
    return RagEngine(cfg, encoder=FakeEncoder(),
                     dispatcher=ScriptedDispatcher(ScriptedBackend()))


def test_engine_creates_ivf_index(tmp_path):
    engine = _engine(tmp_path, index_kind="ivf", index_dtype="float32",
                     ivf_nlist=4, ivf_nprobe=4)
    assert isinstance(engine.index, IVFIndex)
    client = TestClient(create_app(engine=engine))
    for i in range(30):
        client.post("/docs/save", json={"title": f"T{i}",
                                        "content": f"unique topic {i} keywords alpha"})
    r = client.post("/search", json={"query": "unique topic 7 keywords alpha", "k": 3})
    assert r.status_code == 200
    assert len(r.json()["hits"]) == 3


def test_engine_ivf_persist_roundtrip(tmp_path):
    engine = _engine(tmp_path, index_kind="ivf", index_dtype="float32",
                     ivf_nlist=4, ivf_nprobe=4)
    client = TestClient(create_app(engine=engine))
    for i in range(12):
        client.post("/docs/save", json={"title": f"T{i}", "content": f"content number {i} beta"})
    # new engine from the persisted store
    engine2 = _engine(tmp_path, index_kind="ivf", index_dtype="float32",
                      ivf_nlist=4, ivf_nprobe=4)
    assert isinstance(engine2.index, IVFIndex)
    assert engine2.index.count() == 12


def test_engine_int8_dtype(tmp_path):
    engine = _engine(tmp_path, index_dtype="int8")
    client = TestClient(create_app(engine=engine))
    for i in range(8):
        client.post("/docs/save", json={"title": f"T{i}", "content": f"gamma item {i} text"})
    r = client.post("/search", json={"query": "gamma item 3 text", "k": 2})
    assert len(r.json()["hits"]) == 2


def test_engine_int8_pallas_interpret(tmp_path):
    """int8 through the Pallas kernel (interpret mode on CPU)."""
    engine = _engine(tmp_path, index_dtype="int8")
    engine.index.use_pallas = True
    engine.index.pallas_min_rows = 0  # force the Pallas kernel at tiny n
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 32)).astype(np.float32)
    engine.index.add([f"v{i}" for i in range(50)], vecs)
    res = engine.index.search(vecs[7], 1)
    assert res.ids[0][0] == "v7"


def test_engine_mesh_shape_sharded_index(tmp_path):
    """MESH_SHAPE shards the corpus over the device mesh end-to-end."""
    from tpu_rag.parallel.sharded import ShardedFlatIndex

    engine = _engine(tmp_path, mesh_shape="data:8", index_dtype="float32")
    assert isinstance(engine.index, ShardedFlatIndex)
    client = TestClient(create_app(engine=engine))
    for i in range(10):
        client.post("/docs/save", json={"title": f"T{i}", "content": f"delta item {i} text"})
    r = client.post("/search", json={"query": "delta item 4 text", "k": 3})
    assert len(r.json()["hits"]) == 3
    # reload from the persisted store keeps the sharded class
    engine2 = _engine(tmp_path, mesh_shape="data:8", index_dtype="float32")
    assert isinstance(engine2.index, ShardedFlatIndex)
    assert engine2.index.count() == 10


def test_ivf_pallas_probe_path(tmp_path):
    """IVF with the Pallas probe kernel (interpret mode on CPU) end-to-end."""
    from tpu_rag.index import FlatIndex, IVFIndex

    rng = np.random.default_rng(3)
    n, d = 600, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    ivf = IVFIndex(d, dtype="float32", nlist=8, nprobe=8, use_pallas=True)
    ivf.add(ids, vecs)
    flat = FlatIndex(d, dtype="float32", use_pallas=False)
    flat.add(ids, vecs)
    q = rng.standard_normal((2, d)).astype(np.float32)
    assert ivf.search(q, 5).ids == flat.search(q, 5).ids  # full probe = exact


def test_ivf_int8_pallas_probe(tmp_path):
    """int8 lists through the Pallas probe (interpret on CPU)."""
    from tpu_rag.index import IVFIndex

    rng = np.random.default_rng(5)
    n, d = 500, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ivf = IVFIndex(d, dtype="int8", nlist=8, nprobe=8, use_pallas=True)
    ivf.add([f"v{i}" for i in range(n)], vecs)
    res = ivf.search(vecs[123], 5)
    assert res.ids[0][0] == "v123"  # int8 quantization keeps self-recall

"""Multi-host (DCN) path: per-host shard loading + a real 2-process
jax.distributed smoke test on CPU (VERDICT round-1 item #9)."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from tpu_rag.index.flat import FlatIndex
from tpu_rag.index.store import save_index
from tpu_rag.parallel.distributed import (device_row_bounds,
                                          load_sharded_flat_distributed)


def _store(tmp_path, n=3000, d=32, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(d, dtype="float32", use_pallas=False)
    idx.add([f"v{i}" for i in range(n)], vecs, [f"doc {i}" for i in range(n)],
            [{"namespace": "even" if i % 2 == 0 else "odd"} for i in range(n)])
    save_index(idx, tmp_path / "col")
    return idx, vecs


@pytest.mark.skipif(jax.device_count() < 2, reason="needs a multi-device mesh")
def test_distributed_load_matches_direct(tmp_path):
    direct, vecs = _store(tmp_path)
    dist = load_sharded_flat_distributed(tmp_path / "col", dtype="float32",
                                         use_pallas=False)
    qs = vecs[[5, 77, 123]]
    a = dist.search(qs, 5)
    b = direct.search(qs, 5)
    assert a.ids == b.ids
    # filters work through the distributed snapshot
    r = dist.search(vecs[8], 4, namespace="even")
    assert r.ids[0][0] == "v8"
    assert all(m["namespace"] == "even" for m in r.metadatas[0])


@pytest.mark.skipif(jax.device_count() < 2, reason="needs a multi-device mesh")
def test_distributed_index_is_readonly(tmp_path):
    _store(tmp_path)
    dist = load_sharded_flat_distributed(tmp_path / "col", dtype="float32",
                                         use_pallas=False)
    with pytest.raises(RuntimeError, match="read-only"):
        dist.add(["x"], np.ones((1, 32), np.float32))
    with pytest.raises(RuntimeError, match="read-only"):
        dist.delete(ids=["v1"])


def test_device_row_bounds_cover_everything():
    n_pad = jax.device_count() * 256
    lo, hi = device_row_bounds(n_pad)
    assert lo == 0 and hi == n_pad  # single process owns all rows


_WORKER = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address={coord!r},
                               num_processes=2,
                               process_id=int(sys.argv[1]))
    import numpy as np
    from tpu_rag.parallel.distributed import load_sharded_flat_distributed
    from tpu_rag.parallel.mesh import mesh_from_spec

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()   # 2 local x 2 procs
    idx = load_sharded_flat_distributed({store!r}, dtype="float32",
                                        use_pallas=False)
    vecs = np.fromfile(os.path.join({store!r}, "vectors.f32"),
                       dtype=np.float32).reshape(-1, 32)
    res = idx.search(vecs[[7, 42]], 3)
    print("RESULT", json.dumps({{"pid": jax.process_index(), "ids": res.ids}}))
""")


def test_two_process_jax_distributed(tmp_path):
    """Two real OS processes, each with 2 virtual CPU devices, form one
    4-device jax.distributed system; each loads only its row shard and both
    return identical global search results (all_gather crosses processes)."""
    _store(tmp_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
           "JAX_PLATFORMS": "cpu"}
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    code = _WORKER.format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          coord=coord, store=str(tmp_path / "col"))
    procs = [subprocess.Popen([sys.executable, "-c", code, str(pid)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, text=True)
             for pid in (0, 1)]
    outs = []
    for pr in procs:
        try:
            out, err = pr.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            pytest.fail("distributed worker timed out")
        assert pr.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)

    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][0]
        results.append(json.loads(line[len("RESULT "):]))
    assert {r["pid"] for r in results} == {0, 1}
    assert results[0]["ids"] == results[1]["ids"]
    assert results[0]["ids"][0][0] == "v7"
    assert results[0]["ids"][1][0] == "v42"

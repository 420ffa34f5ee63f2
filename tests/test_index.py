"""FlatIndex / IVFIndex / persistence tests (recall vs brute force, CRUD)."""

import numpy as np
import pytest

from tpu_rag.index import FlatIndex, IVFIndex, load_index, save_index


def _corpus(n=800, d=64, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"doc-{i}" for i in range(n)]
    metas = [
        {"namespace": ["lore", "history", "meta"][i % 3],
         "canonicality": ["canon", "non"][i % 2],
         "i": i}
        for i in range(n)
    ]
    docs = [f"document number {i}" for i in range(n)]
    return ids, vecs, docs, metas


def _brute_ids(index_ids, vecs, q, k):
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    scores = vn @ qn
    order = np.argsort(-scores, kind="stable")[:k]
    return [index_ids[i] for i in order]


def test_flat_exact_recall():
    ids, vecs, docs, metas = _corpus()
    idx = FlatIndex(64, dtype="float32")
    idx.add(ids, vecs, docs, metas)
    rng = np.random.default_rng(1)
    q = rng.standard_normal(64).astype(np.float32)
    res = idx.search(q, 10)
    assert res.ids[0] == _brute_ids(ids, vecs, q, 10)
    assert res.documents[0][0].startswith("document number")
    assert all(res.distances[0][i] <= res.distances[0][i + 1] + 1e-6 for i in range(9))


def test_flat_bf16_recall_at_10():
    ids, vecs, docs, metas = _corpus(n=2000)
    idx = FlatIndex(64, dtype="bfloat16")
    idx.add(ids, vecs, docs, metas)
    rng = np.random.default_rng(2)
    recalls = []
    for _ in range(5):
        q = rng.standard_normal(64).astype(np.float32)
        res = idx.search(q, 10)
        truth = set(_brute_ids(ids, vecs, q, 10))
        recalls.append(len(set(res.ids[0]) & truth) / 10)
    assert np.mean(recalls) >= 0.95


def test_flat_namespace_filter():
    ids, vecs, docs, metas = _corpus()
    idx = FlatIndex(64, dtype="float32")
    idx.add(ids, vecs, docs, metas)
    q = np.random.default_rng(3).standard_normal(64).astype(np.float32)
    res = idx.search(q, 10, namespace="lore")
    assert len(res.ids[0]) == 10
    assert all(m["namespace"] == "lore" for m in res.metadatas[0])
    res2 = idx.search(q, 10, namespace="lore", canonicality="canon")
    assert all(m["namespace"] == "lore" and m["canonicality"] == "canon"
               for m in res2.metadatas[0])
    # unknown tag -> zero hits, not an error
    res3 = idx.search(q, 10, namespace="never-seen")
    assert res3.ids[0] == []


def test_flat_upsert_and_delete():
    idx = FlatIndex(8, dtype="float32")
    v = np.eye(8, dtype=np.float32)
    idx.add([f"id{i}" for i in range(8)], v)
    assert idx.count() == 8
    # upsert replaces
    idx.add(["id0"], -v[:1])
    assert idx.count() == 8
    got = idx.get("id0")
    assert got is not None and got["vector"][0] < 0
    # delete by id
    assert idx.delete(ids=["id1", "id2"]) == 2
    assert idx.count() == 6
    res = idx.search(v[1], 6)
    assert "id1" not in res.ids[0]
    # delete by metadata where
    idx2 = FlatIndex(8, dtype="float32")
    idx2.add(["a", "b"], v[:2], metadatas=[{"source_key": "x"}, {"source_key": "y"}])
    assert idx2.delete(where={"source_key": "x"}) == 1
    assert idx2.count() == 1


def test_ivf_recall_vs_flat():
    ids, vecs, docs, metas = _corpus(n=3000, d=64)
    ivf = IVFIndex(64, dtype="float32", nlist=32, nprobe=8, use_pallas=False)
    ivf.add(ids, vecs, docs, metas)
    rng = np.random.default_rng(5)
    recalls = []
    for _ in range(8):
        q = rng.standard_normal(64).astype(np.float32)
        truth = set(_brute_ids(ids, vecs, q, 10))
        res = ivf.search(q, 10)
        recalls.append(len(set(res.ids[0]) & truth) / 10)
    assert np.mean(recalls) >= 0.7  # nprobe=8/32 on random data
    # full probe = exact
    ivf.nprobe = 32
    recalls = []
    for _ in range(8):
        q = rng.standard_normal(64).astype(np.float32)
        truth = set(_brute_ids(ids, vecs, q, 10))
        res = ivf.search(q, 10)
        recalls.append(len(set(res.ids[0]) & truth) / 10)
    assert np.mean(recalls) == 1.0


def test_ivf_overflow_streaming_add():
    """New rows are searchable immediately via the overflow buffer."""
    ids, vecs, docs, metas = _corpus(n=1000, d=32)
    ivf = IVFIndex(32, dtype="float32", nlist=16, nprobe=16)
    ivf.add(ids[:900], vecs[:900], docs[:900], metas[:900])
    ivf.search(vecs[0], 1)  # force initial build
    ivf.add(ids[900:], vecs[900:], docs[900:], metas[900:])
    res = ivf.search(vecs[950], 1)
    assert res.ids[0][0] == "doc-950"


def test_ivf_filter():
    ids, vecs, docs, metas = _corpus(n=1000, d=32)
    ivf = IVFIndex(32, dtype="float32", nlist=16, nprobe=16)
    ivf.add(ids, vecs, docs, metas)
    q = np.random.default_rng(7).standard_normal(32).astype(np.float32)
    res = ivf.search(q, 8, namespace="history")
    assert len(res.ids[0]) == 8
    assert all(m["namespace"] == "history" for m in res.metadatas[0])


def test_save_load_roundtrip(tmp_path):
    ids, vecs, docs, metas = _corpus(n=200, d=32)
    idx = FlatIndex(32, dtype="float32")
    idx.add(ids, vecs, docs, metas)
    save_index(idx, tmp_path / "col")
    loaded = load_index(tmp_path / "col")
    assert loaded.count() == 200
    q = vecs[17]
    assert loaded.search(q, 1).ids[0][0] == "doc-17"
    assert loaded.get("doc-5")["metadata"]["i"] == 5


def test_save_load_ivf(tmp_path):
    ids, vecs, docs, metas = _corpus(n=300, d=32)
    idx = IVFIndex(32, dtype="float32", nlist=8, nprobe=8)
    idx.add(ids, vecs, docs, metas)
    save_index(idx, tmp_path / "col")
    loaded = load_index(tmp_path / "col")
    assert isinstance(loaded, IVFIndex)
    assert loaded.search(vecs[42], 1).ids[0][0] == "doc-42"


def test_empty_index_search():
    idx = FlatIndex(16)
    res = idx.search(np.ones(16, np.float32), 5)
    assert res.ids == [[]]


def test_concurrent_add_search_delete():
    """Mutations and searches from multiple threads stay consistent
    (the reference had unguarded shared state — SURVEY.md §5)."""
    import threading

    idx = FlatIndex(16, dtype="float32", use_pallas=False)
    rng = np.random.default_rng(0)
    base = rng.standard_normal((64, 16)).astype(np.float32)
    idx.add([f"seed{i}" for i in range(64)], base)
    errors = []

    def adder(t):
        try:
            for i in range(20):
                v = rng.standard_normal((1, 16)).astype(np.float32)
                idx.add([f"t{t}-{i}"], v)
        except Exception as e:
            errors.append(e)

    def searcher():
        try:
            for _ in range(30):
                res = idx.search(base[0], 5)
                assert len(res.ids[0]) == 5
        except Exception as e:
            errors.append(e)

    def deleter():
        try:
            for i in range(0, 30, 2):
                idx.delete(ids=[f"seed{i}"])
        except Exception as e:
            errors.append(e)

    threads = ([threading.Thread(target=adder, args=(t,)) for t in range(3)]
               + [threading.Thread(target=searcher) for _ in range(3)]
               + [threading.Thread(target=deleter)])
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert idx.count() == 64 - 15 + 60


def test_ivf_list_cap_spill_preserves_recall():
    """With a tight list cap, rows beyond the cap spill to the exact
    overflow buffer — nothing is lost."""
    rng = np.random.default_rng(11)
    # skewed data: 80% of rows clustered in one direction
    base = rng.standard_normal((1, 32)).astype(np.float32)
    bulk = base + 0.05 * rng.standard_normal((800, 32)).astype(np.float32)
    rest = rng.standard_normal((200, 32)).astype(np.float32)
    vecs = np.concatenate([bulk, rest])
    ids = [f"v{i}" for i in range(1000)]
    ivf = IVFIndex(32, dtype="float32", nlist=8, nprobe=8,
                   list_cap_factor=1.0, use_pallas=False)
    ivf.add(ids, vecs)
    snap = ivf.device_snapshot()
    assert len(snap["ov_rows"]) > 0  # something spilled
    # total rows preserved: lists + overflow == 1000
    placed = int((np.asarray(snap["row_lists"]) >= 0).sum())
    assert placed + len(snap["ov_rows"]) == 1000
    # exhaustive probe + exact overflow -> exact results
    for probe in (vecs[3], vecs[950]):
        res = ivf.search(probe, 1)
        flat = FlatIndex(32, dtype="float32", use_pallas=False)
        flat.add(ids, vecs)
        assert res.ids[0] == flat.search(probe, 1).ids[0]


def test_group_lists_device_grouping():
    """ops/ivf_build.group_lists: every row lands in its cluster at a unique
    slot, or is reported as spill."""
    import jax.numpy as jnp

    from tpu_rag.ops.ivf_build import group_lists
    from tpu_rag.ops.topk import PAD_TAG

    rng = np.random.default_rng(0)
    n, d, nlist, cap = 200, 8, 4, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    assign = rng.integers(0, nlist, n).astype(np.int32)
    ns = np.arange(n, dtype=np.int32)
    rows = np.arange(n, dtype=np.int32)

    vec_lists, ns_lists, canon_lists, row_lists, order, fits = group_lists(
        jnp.asarray(x), jnp.asarray(ns), jnp.asarray(ns), jnp.asarray(rows),
        jnp.asarray(assign), nlist=nlist, cap=cap)

    row_lists = np.asarray(row_lists)
    vec_lists = np.asarray(vec_lists)
    placed = row_lists[row_lists >= 0]
    spilled = np.asarray(order)[~np.asarray(fits)]
    assert len(placed) + len(spilled) == n
    assert len(set(placed.tolist())) == len(placed)  # unique slots
    # each placed row is in the list matching its assignment, with its vector
    for li in range(nlist):
        for si in range(cap):
            r = row_lists[li, si]
            if r >= 0:
                assert assign[r] == li
                np.testing.assert_allclose(vec_lists[li, si], x[r], rtol=1e-6)
            else:
                assert np.asarray(ns_lists)[li, si] == PAD_TAG


def test_group_lists_spill_when_capped():
    import jax.numpy as jnp

    from tpu_rag.ops.ivf_build import group_lists

    n, d, nlist, cap = 100, 4, 2, 16
    x = np.ones((n, d), np.float32)
    assign = np.zeros(n, np.int32)  # everything in cluster 0
    z = np.zeros(n, np.int32)
    _, _, _, row_lists, order, fits = group_lists(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(z),
        jnp.asarray(np.arange(n, dtype=np.int32)), jnp.asarray(assign),
        nlist=nlist, cap=cap)
    assert int(np.asarray(fits).sum()) == cap  # only cap rows fit
    assert (np.asarray(row_lists)[0] >= 0).sum() == cap
    assert (np.asarray(row_lists)[1] >= 0).sum() == 0


def test_ivf_probe_pallas_matches_xla():
    """Pallas scalar-prefetch probe (interpret mode) == XLA probe."""
    import jax.numpy as jnp

    from tpu_rag.index.ivf import _probe_impl
    from tpu_rag.ops.ivf_probe import ivf_probe_pallas
    from tpu_rag.ops.topk import PAD_TAG

    rng = np.random.default_rng(0)
    nlist, cap, d, Q, nprobe, k = 16, 64, 128, 4, 4, 5
    centroids = rng.standard_normal((nlist, d)).astype(np.float32)
    vec_lists = rng.standard_normal((nlist, cap, d)).astype(np.float32)
    ns = rng.integers(0, 3, (nlist, cap)).astype(np.int32)
    ns[:, -8:] = PAD_TAG
    canon = np.zeros((nlist, cap), np.int32)
    rows = rng.integers(0, 10_000, (nlist, cap)).astype(np.int32)
    scales = np.ones((nlist, cap), np.float32)
    q = rng.standard_normal((Q, d)).astype(np.float32)
    wants = jnp.array([1, -1], jnp.int32)

    args = (jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(vec_lists),
            jnp.asarray(scales), jnp.asarray(ns), jnp.asarray(canon),
            jnp.asarray(rows), wants)
    sc1, r1 = _probe_impl(*args, nprobe=nprobe, k=k)
    sc2, r2 = ivf_probe_pallas(*args, nprobe=nprobe, k=k, interpret=True)
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2), atol=1e-4)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))


def test_ivf_probe_batched_recall_and_consistency():
    """Batch-shared probe (interpret mode): per-query candidates come from
    that query's own nprobe lists, returned scores are the true (scaled)
    dot products, filters hold, and recall vs the exact XLA probe is high
    (the per-bucket top-2 reduction is approximate by design)."""
    import jax.numpy as jnp

    from tpu_rag.index.ivf import _probe_impl
    from tpu_rag.ops.ivf_probe import ivf_probe_batched
    from tpu_rag.ops.topk import PAD_TAG

    rng = np.random.default_rng(1)
    nlist, cap, d, Q, nprobe, k = 16, 256, 128, 6, 4, 5
    centroids = rng.standard_normal((nlist, d)).astype(np.float32)
    vec_lists = rng.standard_normal((nlist, cap, d)).astype(np.float32)
    ns = rng.integers(0, 3, (nlist, cap)).astype(np.int32)
    ns[:, -8:] = PAD_TAG
    canon = np.zeros((nlist, cap), np.int32)
    rows = np.arange(nlist * cap, dtype=np.int32).reshape(nlist, cap)
    scales = np.ones((nlist, cap), np.float32)
    q = rng.standard_normal((Q, d)).astype(np.float32)
    wants = jnp.array([1, -1], jnp.int32)

    args = (jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(vec_lists),
            jnp.asarray(scales), jnp.asarray(ns), jnp.asarray(canon),
            jnp.asarray(rows), wants)
    sc1, r1 = _probe_impl(*args, nprobe=nprobe, k=k)
    sc2, r2 = ivf_probe_batched(*args, nprobe=nprobe, k=k, interpret=True)
    sc1, r1 = np.asarray(sc1), np.asarray(r1)
    sc2, r2 = np.asarray(sc2), np.asarray(r2)

    sims = q @ centroids.T
    probed = np.argsort(-sims, axis=1)[:, :nprobe]
    hits = total = 0
    for i in range(Q):
        got = r2[i][r2[i] >= 0]
        assert len(set(got.tolist())) == len(got)          # no dup rows
        for j, row in enumerate(r2[i]):
            if row < 0:
                continue
            li, si = divmod(int(row), cap)                 # rows == slot ids
            assert li in probed[i]                         # own-list candidates
            assert ns[li, si] == 1                         # filter respected
            true = float(q[i] @ vec_lists[li, si])
            np.testing.assert_allclose(sc2[i, j], true, atol=1e-4)
        want = set(r1[i][r1[i] >= 0].tolist())
        hits += len(want & set(got.tolist()))
        total += len(want)
    assert hits / max(total, 1) >= 0.9


def test_ivf_centroid_persistence_skips_kmeans(tmp_path, monkeypatch):
    """Reloading a persisted IVF index reuses the saved centroids (k-means
    only re-runs when the corpus doubles past what they were trained on)."""
    ids, vecs, docs, metas = _corpus(n=400, d=32)
    idx = IVFIndex(32, dtype="float32", nlist=8, nprobe=8, use_pallas=False)
    idx.add(ids, vecs, docs, metas)
    idx.device_snapshot()  # build (trains centroids)
    save_index(idx, tmp_path / "col")

    import tpu_rag.index.ivf as ivf_mod

    calls = []
    real_kmeans = ivf_mod.kmeans
    monkeypatch.setattr(ivf_mod, "kmeans",
                        lambda *a, **k: calls.append(1) or real_kmeans(*a, **k))
    loaded = load_index(tmp_path / "col", use_pallas=False)
    assert loaded._cached_centroids is not None
    res = loaded.search(vecs[42], 1)
    assert res.ids[0][0] == "doc-42"
    assert calls == []  # no retraining on reload

    # doubling the corpus triggers a retrain at the next compaction (small
    # adds are absorbed by the device append block without rebuilding)
    more = np.random.default_rng(1).standard_normal((500, 32)).astype(np.float32)
    loaded.add([f"extra{i}" for i in range(500)], more)
    loaded.search(vecs[0], 1)
    assert calls == []  # absorbed incrementally, no rebuild yet
    loaded.compact()
    loaded.search(vecs[0], 1)
    assert calls == [1]


def test_corrupt_manifest_falls_back_to_empty(tmp_path):
    """engine: unreadable persisted index -> warn + fresh empty index."""
    from tpu_rag.config import Config
    from tpu_rag.engine import RagEngine
    from tests.test_api import FakeEncoder

    col = tmp_path / "vs" / "gamefantasy"
    col.mkdir(parents=True)
    (col / "manifest.json").write_text("{not json", encoding="utf-8")
    cfg = Config(persist_dir=str(tmp_path / "vs"),
                 kb_db_path=str(tmp_path / "db/kb.sqlite3"),
                 db_path=str(tmp_path / "db/app.sqlite3"),
                 docs_dir=str(tmp_path / "docs"),
                 index_dtype="float32", use_pallas=False)
    engine = RagEngine(cfg, encoder=FakeEncoder())
    assert engine.index.count() == 0  # degraded to a fresh index, no crash


def test_int8_refine_recovers_recall():
    """int8 scan + exact refine matches f32 exact recall."""
    ids, vecs, docs, metas = _corpus(n=5000, d=64)
    exact = FlatIndex(64, dtype="float32", use_pallas=False)
    exact.add(ids, vecs, docs, metas)
    i8 = FlatIndex(64, dtype="int8", use_pallas=False)
    i8.add(ids, vecs, docs, metas)
    i8_raw = FlatIndex(64, dtype="int8", use_pallas=False)
    i8_raw.refine_factor = 0
    i8_raw.add(ids, vecs, docs, metas)

    rng = np.random.default_rng(9)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    truth = exact.search(q, 10)
    refined = i8.search(q, 10)
    raw = i8_raw.search(q, 10)
    rec_refined = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(truth.ids, refined.ids)])
    rec_raw = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(truth.ids, raw.ids)])
    assert rec_refined >= rec_raw
    assert rec_refined >= 0.97


def test_auto_search_mode_routing():
    """"auto" (the default) resolves below auto_bucketed_min_rows to the
    exact kernel — NEVER packed (BENCH_r03 measured packed recall@10 0.8031
    on real v5e from equal-key tie flooding while exact measured 1.0 at
    higher QPS) — and to bucketed at/above the threshold; explicit modes
    pass through unchanged."""
    idx = FlatIndex(64)  # dtype bfloat16, refine on
    assert idx.search_mode == "auto"
    assert idx.effective_search_mode(idx.auto_bucketed_min_rows - 1) == "exact"
    assert idx.effective_search_mode(idx.auto_bucketed_min_rows) == "bucketed"
    f32 = FlatIndex(64, dtype="float32")
    assert f32.effective_search_mode(10) == "exact"
    assert FlatIndex(64, dtype="int8").effective_search_mode(10) == "exact"
    assert FlatIndex(64, search_mode="exact").effective_search_mode(10**8) == "exact"
    assert FlatIndex(64, search_mode="bucketed").effective_search_mode(10) == "bucketed"
    assert FlatIndex(64, search_mode="packed").effective_search_mode(10) == "packed"


def test_auto_search_mode_runs_bucketed_kernel():
    """With the threshold lowered, auto actually routes through the bucketed
    Pallas kernel and still returns high-recall results."""
    ids, vecs, docs, metas = _corpus(n=30000, d=64)
    exact = FlatIndex(64, dtype="float32", use_pallas=False)
    exact.add(ids, vecs, docs, metas)
    a = FlatIndex(64, dtype="bfloat16")  # search_mode defaults to "auto"
    a.auto_bucketed_min_rows = 1000      # force the bucketed branch
    a.add(ids, vecs, docs, metas)
    rng = np.random.default_rng(13)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    truth = exact.search(q, 10)
    got = a.search(q, 10)
    assert any(key[0] == "direct" and key[4] == "bucketed" and key[5]
               for key in a._xla_fn_cache
               if isinstance(key, tuple) and len(key) == 8)
    rec = np.mean([len(set(t) & set(x)) / 10 for t, x in zip(truth.ids, got.ids)])
    assert rec >= 0.95


def test_bucketed_recall_at_scale():
    ids, vecs, docs, metas = _corpus(n=30000, d=64)
    exact = FlatIndex(64, dtype="float32", use_pallas=False)
    exact.add(ids, vecs, docs, metas)
    # bucketed needs n >> 128 * k for dense-enough candidates
    b = FlatIndex(64, dtype="bfloat16", search_mode="bucketed")
    b.pallas_min_rows = 0
    b.add(ids, vecs, docs, metas)
    rng = np.random.default_rng(13)
    q = rng.standard_normal((6, 64)).astype(np.float32)
    truth = exact.search(q, 10)
    got = b.search(q, 10)
    rec = np.mean([len(set(a) & set(x)) / 10 for a, x in zip(truth.ids, got.ids)])
    assert rec >= 0.95


def test_explicit_packed_surfaces_kernel_failure(monkeypatch):
    """Packed is explicit opt-in only: a kernel failure must surface to the
    caller unwrapped (no silent demotion that would mask a mode the user
    pinned on purpose).  Auto mode never routes packed, so it never hits
    the failing path at all."""
    import tpu_rag.index.flat as flat_mod

    orig = flat_mod.fused_matmul_topk

    def failing(*a, **kw):
        if kw.get("mode") == "packed":
            raise RuntimeError("simulated mosaic rejection")
        return orig(*a, **kw)

    monkeypatch.setattr(flat_mod, "fused_matmul_topk", failing)
    ids, vecs, docs, metas = _corpus(n=600, d=64)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 64)).astype(np.float32)
    auto = FlatIndex(64, dtype="bfloat16", use_pallas=True)
    auto.add(ids, vecs, docs, metas)
    res = auto.search(q, 5)             # auto = exact; never touches packed
    assert all(len(r) == 5 for r in res.ids)
    pinned = FlatIndex(64, dtype="bfloat16", use_pallas=True,
                       search_mode="packed")
    pinned.add(ids, vecs, docs, metas)
    with pytest.raises(RuntimeError, match="simulated mosaic rejection"):
        pinned.search(q, 5)


def test_packed_tie_flood_recall_within_oversample():
    """Regression for BENCH_r03's packed recall 0.8031: scores tied within
    the packed key's ~2^-10 relative resolution are selected by index, not
    true score — the packed_k_scan oversample (>= 64) must cover the tie
    census so the f32 refine restores the exact order.  50 near-duplicate
    rows (f32-distinct, key-tied) flood rank-10; the old 2k oversample
    returned ~the 20 lowest-INDEX dupes and lost the true top-10."""
    rng = np.random.default_rng(11)
    d, n_dupes, k = 64, 50, 10
    base = rng.standard_normal(d).astype(np.float32)
    base /= np.linalg.norm(base)
    # near-duplicates: cosine gaps ~1e-5 — far above f32 resolution (so a
    # true order exists) but far below the 18-bit key ulp at score ~1.0
    # (~2e-3), so the packed scan sees all 50 as one equal-key flood
    dupes = base[None, :] + 3e-3 * rng.standard_normal((n_dupes, d)).astype(np.float32)
    rest = rng.standard_normal((3000, d)).astype(np.float32)
    rest /= np.linalg.norm(rest, axis=1, keepdims=True) * 2  # strictly worse
    vecs = np.concatenate([rest, dupes]).astype(np.float32)
    ids = [str(i) for i in range(len(vecs))]
    pinned = FlatIndex(d, dtype="bfloat16", use_pallas=True,
                       search_mode="packed")
    pinned.pallas_min_rows = 0
    pinned.add(ids, vecs, ["t"] * len(vecs), [{} for _ in vecs])
    q = base[None, :]
    # ground truth from the index's own f32 master copy (identical
    # normalization and summation order as the refine uses) — an
    # independently-built exact index would re-introduce f32 tie noise
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sc_all = pinned._arena.view @ qn[0]
    truth_rows = set(np.argsort(-sc_all, kind="stable")[:k].tolist())
    got = pinned.search(q, k)
    rec = len(truth_rows & set(got.rows[0])) / k
    assert rec == 1.0, f"packed oversample failed the tie flood: {rec}"


def test_auto_dtype_resolves_and_crosses_threshold(tmp_path):
    """INDEX_DTYPE=auto: bf16 below auto_int8_min_rows, int8 at/above; a
    corpus crossing the threshold rebuilds the snapshot in int8 and the
    f32 refine keeps results consistent."""
    idx = FlatIndex(32, dtype="auto", use_pallas=False)
    idx.auto_int8_min_rows = 500
    rng = np.random.default_rng(21)
    x = rng.standard_normal((600, 32)).astype(np.float32)
    ids = [f"d{i}" for i in range(600)]
    idx.add(ids[:400], x[:400])
    assert idx.dtype == "bfloat16"
    q = rng.standard_normal((2, 32)).astype(np.float32)
    r1 = idx.search(q, 5)
    assert idx.device_snapshot()["dtype"] == "bfloat16"
    idx.add(ids[400:], x[400:])          # crosses the threshold
    assert idx.dtype == "int8"
    r2 = idx.search(q, 5)                # rebuild happens inside
    assert idx.device_snapshot()["dtype"] == "int8"
    assert all(len(r) == 5 for r in r2.ids)
    # the refine keeps int8 results aligned with exact f32 ground truth
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    truth = np.argsort(-(qn @ xn.T), axis=1)[:, :5]
    got = [[ids.index(i) for i in row] for row in r2.ids]
    rec = np.mean([len(set(got[i]) & set(truth[i])) / 5 for i in range(2)])
    assert rec >= 0.9
    # persistence round-trips the UNRESOLVED config
    save_index(idx, tmp_path / "st")
    import json as _json
    man = _json.loads((tmp_path / "st" / "manifest.json").read_text())
    assert man["dtype"] == "auto"
    loaded = load_index(tmp_path / "st", use_pallas=False)
    assert loaded.dtype_config == "auto" and loaded.dtype == "bfloat16"
    loaded.auto_int8_min_rows = 500
    assert loaded.dtype == "int8"


def test_refine_k_scan_mode_dispatch():
    """The oversample policy is part of the recall contract: bf16 2x, int8
    refine_factor*x, packed >= max(4k, 64) (tie-census cover), f32 none."""
    from tpu_rag.index.flat import refine_k_scan
    from tpu_rag.ops.topk import packed_k_scan

    n = 100_000
    assert refine_k_scan("bfloat16", 4, 10, n) == 20          # bf16 -> 2x
    assert refine_k_scan("int8", 4, 10, n) == 40              # int8 -> rf*x
    assert refine_k_scan("float32", 4, 10, n) == 10           # no refine
    assert refine_k_scan("bfloat16", 0, 10, n) == 10          # refine off
    assert refine_k_scan("bfloat16", 4, 10, n, mode="packed") == 64
    assert packed_k_scan(10, n) == 64
    assert packed_k_scan(32, n) == 128                        # 4k > floor
    assert packed_k_scan(10, 30) == 30                        # clamp to n


def test_ivf_probe_int8_mxu_path_matches_quantized_truth():
    """int8 lists route both pallas probes through the int8 x int8 MXU
    recipe (round 5): queries are quantized in the wrapper, per-query scale
    applied after the merge.  Candidates must match the XLA probe's (same
    quantized corpus) and returned scores must equal the true scaled dot
    products up to query-quantization error (~1-2%, same as the flat int8
    path)."""
    import jax.numpy as jnp

    from tpu_rag.index.ivf import _probe_impl
    from tpu_rag.ops.ivf_probe import ivf_probe_batched, ivf_probe_pallas
    from tpu_rag.ops.quant import quantize_int8_rows
    from tpu_rag.ops.topk import PAD_TAG

    rng = np.random.default_rng(3)
    nlist, cap, d, Q, nprobe, k = 16, 256, 128, 6, 6, 10
    centroids = rng.standard_normal((nlist, d)).astype(np.float32)
    vecs = rng.standard_normal((nlist * cap, d)).astype(np.float32)
    v8, s8 = quantize_int8_rows(jnp.asarray(vecs))
    vec_lists = v8.reshape(nlist, cap, d)
    scales = np.asarray(s8).reshape(nlist, cap)
    ns = np.zeros((nlist, cap), np.int32)
    ns[:, -8:] = PAD_TAG
    rows = np.arange(nlist * cap, dtype=np.int32).reshape(nlist, cap)
    q = rng.standard_normal((Q, d)).astype(np.float32)
    wants = jnp.array([-1, -1], jnp.int32)
    args = (jnp.asarray(q), jnp.asarray(centroids), vec_lists,
            jnp.asarray(scales), jnp.asarray(ns), jnp.asarray(ns),
            jnp.asarray(rows), wants)

    sc0, r0 = _probe_impl(*args, nprobe=nprobe, k=k)
    sc1, r1 = ivf_probe_pallas(*args, nprobe=nprobe, k=k, interpret=True)
    sc2, r2 = ivf_probe_batched(*args, nprobe=nprobe, k=k, interpret=True)
    r0, r1, r2 = map(np.asarray, (r0, r1, r2))
    ov1 = np.mean([len(set(r0[i]) & set(r1[i])) / k for i in range(Q)])
    ov2 = np.mean([len(set(r0[i]) & set(r2[i])) / k for i in range(Q)])
    assert ov1 >= 0.9, ov1   # exact per-list top-k: near-identical
    assert ov2 >= 0.8, ov2   # bucketed top-2-per-128-lane: approximate

    flat_v = np.asarray(vec_lists).reshape(-1, d).astype(np.float32)
    flat_s = scales.reshape(-1)
    for sc_p, r_p in ((np.asarray(sc1), r1), (np.asarray(sc2), r2)):
        for i in range(Q):
            for sval, rw in zip(sc_p[i], r_p[i]):
                if rw < 0:
                    continue
                true = float(q[i] @ (flat_v[rw] * flat_s[rw]))
                # query-quantization error bound: d * (q_absmax/127)/2 * |v|
                assert abs(sval - true) <= 0.35, (sval, true)

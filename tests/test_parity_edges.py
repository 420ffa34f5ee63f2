"""Behavioral edge cases preserved from the reference (SURVEY.md §7
"Behavioral edge cases to preserve")."""

import hashlib

import numpy as np
import pytest

from tpu_rag.api.app import create_app
from tpu_rag.api.testclient import TestClient
from tpu_rag.config import Config
from tpu_rag.engine import RagEngine

from tests.test_api import FakeEncoder, ScriptedBackend, ScriptedDispatcher


@pytest.fixture()
def env(tmp_path):
    cfg = Config(
        persist_dir=str(tmp_path / "vs"),
        kb_db_path=str(tmp_path / "db/kb.sqlite3"),
        db_path=str(tmp_path / "db/app.sqlite3"),
        docs_dir=str(tmp_path / "docs"),
        index_dtype="float32",
        use_pallas=False,
        summarize_mode="off",
    )
    engine = RagEngine(cfg, encoder=FakeEncoder(),
                       dispatcher=ScriptedDispatcher(ScriptedBackend()))
    return engine, TestClient(create_app(engine=engine))


def _seed(client, n=25):
    for i in range(n):
        client.post("/docs/save", json={
            "title": f"Doc {i}", "content": f"dragon topic number {i} alpha beta",
            "metadata": {"namespace": "lore"}})


def test_k_clamped_1_to_20(env):
    engine, client = env
    _seed(client, 25)
    # k=50 -> vector hits clamped to 20 (reference api/app.py:546)
    hits = engine.query_vector("dragon topic", 50, None, None)
    assert len(hits) == 20
    hits = engine.query_vector("dragon topic", 0, None, None)
    assert len(hits) == 1


def test_fts_gets_half_k_and_vector_first(env):
    engine, client = env
    # one vector doc + kb items that match by keyword
    client.post("/docs/save", json={"title": "V", "content": "zebra unique vecword"})
    for i in range(6):
        engine.db.upsert_kb_item("wiki", str(i), f"K{i}", "zebra keyword row")
    hits = engine.search_internal("zebra", 6, None, None, rerank=False)
    # FTS contributes at most k//2 = 3 (reference api/app.py:587)
    db_hits = [h for h in hits if str(h["id"]).startswith("db:")]
    assert len(db_hits) == 3
    # vector hits come first (reference api/app.py:595)
    assert not str(hits[0]["id"]).startswith("db:")


def test_compose_ignores_rerank_flag(env, monkeypatch):
    """The reference's _search_internal takes `rerank` but never applies it
    (api/app.py:585-598) — /compose must not invoke the cross-encoder."""
    engine, client = env
    _seed(client, 3)
    called = []
    monkeypatch.setattr(engine, "rerank", lambda q, h: called.append(1) or h)
    client.post("/compose", json={"query": "dragon topic", "k": 3, "rerank": True})
    assert called == []


def test_search_honors_rerank_flag(env, monkeypatch):
    engine, client = env
    _seed(client, 3)
    called = []

    def fake_rerank(q, hits):
        called.append(1)
        return hits

    monkeypatch.setattr(engine, "rerank", fake_rerank)
    client.post("/search", json={"query": "dragon topic", "k": 3, "rerank": True})
    assert called == [1]
    client.post("/search", json={"query": "dragon topic", "k": 3, "rerank": False})
    assert called == [1]  # unchanged


def test_stream_tail_full_hits_vs_compose_slim_citations(env):
    engine, client = env
    _seed(client, 2)
    r = client.post("/compose", json={"query": "dragon topic", "k": 2})
    slim = r.json()["citations"][0]
    assert set(slim) == {"id", "file_path", "section"}  # slim (chat.py:166-169)

    import json as _json

    r = client.post("/compose_stream", json={"query": "dragon topic", "k": 2})
    frames = "".join(r.iter_stream())
    tail = [_json.loads(b[6:]) for b in frames.split("\n\n")
            if b.startswith("data: ") and "citations" in b][0]
    full = tail["citations"][0]
    assert "text" in full and "metadata" in full and "score" in full  # full objects


def test_auth_disabled_for_changeme_key(tmp_path):
    cfg = Config(
        persist_dir=str(tmp_path / "vs"), kb_db_path=str(tmp_path / "db/kb.sqlite3"),
        db_path=str(tmp_path / "db/app.sqlite3"), docs_dir=str(tmp_path / "docs"),
        api_key="changeme", index_dtype="float32", use_pallas=False)
    engine = RagEngine(cfg, encoder=FakeEncoder(),
                       dispatcher=ScriptedDispatcher(ScriptedBackend()))
    client = TestClient(create_app(engine=engine))
    # "changeme" means auth off (reference api/app.py:118-121)
    assert client.get("/health").status_code == 200


def test_meta_filter_skipped_when_canonicality_meta(env):
    engine, client = env
    client.post("/docs/save", json={
        "title": "Schema Guide", "content": "meta dragondoc content",
        "metadata": {"namespace": "meta", "canonicality": "meta"}})
    # default: meta hit filtered out of hybrid search
    hits = engine.search_internal("dragondoc", 5, None, None, False)
    assert hits == []
    # canonicality=meta: filter disabled AND vector filter selects meta rows
    hits = engine.search_internal("dragondoc", 5, None, "meta", False)
    assert any("Schema Guide" == (h.get("metadata") or {}).get("title") for h in hits)


def test_content_hash_whitespace_invariant():
    from tpu_rag.ingest.schema import content_hash, normalize_text

    assert normalize_text("  a \n\t b  ") == "a b"
    assert content_hash("a   b") == content_hash("a\nb")
    assert content_hash("a b") == hashlib.sha256(b"a b").hexdigest()


def test_slug_cjk_preserved():
    from tpu_rag.ingest.schema import slug

    assert slug("Hello World!") == "hello-world"
    assert slug("月亮 Temple") == "月亮-temple"
    assert slug("") == "untitled"
    assert len(slug("x" * 200)) == 80


def test_rerank_ensemble_mode_blends_scores():
    """mode='ensemble' z-score-blends retriever similarity (negated
    distance) with the cross-encoder instead of replacing the ordering;
    mode='replace' keeps reference parity (CE score alone decides)."""
    from tpu_rag.retrieval.rerank import rerank_hits

    class CE:
        def predict(self, pairs):
            import numpy as np
            # CE strongly prefers the SECOND hit
            return np.array([0.0, 10.0, 1.0], np.float32)

    # retriever strongly prefers hit a (distance 0.01 << others)
    hits = [{"rank": 1, "id": "a", "score": 0.01, "text": "a"},
            {"rank": 2, "id": "b", "score": 0.90, "text": "b"},
            {"rank": 3, "id": "c", "score": 0.50, "text": "c"}]
    replaced = rerank_hits(CE(), "q", [dict(h) for h in hits], mode="replace")
    assert [h["id"] for h in replaced] == ["b", "c", "a"]  # CE order only

    blended = rerank_hits(CE(), "q", [dict(h) for h in hits], mode="ensemble")
    assert all("ensemble_score" in h and "rerank_score" in h for h in blended)
    # both signals matter: 'b' (CE favorite) and 'a' (retriever favorite)
    # outrank 'c', which neither signal favors
    assert [h["id"] for h in blended][-1] == "c"
    assert [h["rank"] for h in blended] == [1, 2, 3]


def test_rerank_ensemble_mixed_families_normalized_separately():
    """Vector distances (~[0,2]) and FTS bm25 scores (negative, magnitude
    ~0-10) must be z-normalized per source family: pooled z-scoring pins
    FTS hits to the top of the blend regardless of cross-encoder signal
    (ADVICE r2 medium).  With per-family norms, a CE that strongly
    dispreferred the FTS hit must be able to demote it."""
    from tpu_rag.retrieval.rerank import rerank_hits

    class CE:
        def predict(self, pairs):
            import numpy as np
            # CE: vector hits fine, FTS hit (last) is junk
            return np.array([5.0, 4.0, 3.0, -5.0], np.float32)

    hits = [{"rank": 1, "id": "a", "score": 0.10, "text": "a"},
            {"rank": 2, "id": "b", "score": 0.50, "text": "b"},
            {"rank": 3, "id": "c", "score": 0.90, "text": "c"},
            # FTS hit: bm25 -8.0; negated (+8.0) it sits far above the
            # negated distances, so a pooled z-norm would pin it to rank 1
            {"rank": 0, "id": "db:manual:7", "score": -8.0, "text": "junk"}]
    out = rerank_hits(CE(), "q", [dict(h) for h in hits], mode="ensemble")
    assert [h["id"] for h in out][-1] == "db:manual:7"
    assert [h["id"] for h in out][0] == "a"  # both signals favor 'a'


def test_rerank_ensemble_single_hit_noop_order():
    from tpu_rag.retrieval.rerank import rerank_hits

    class CE:
        def predict(self, pairs):
            import numpy as np
            return np.zeros((len(pairs),), np.float32)

    out = rerank_hits(CE(), "q", [{"rank": 1, "id": "x", "score": 0.2,
                                   "text": "x"}], mode="ensemble")
    assert [h["id"] for h in out] == ["x"]


def test_rerank_annotate_mode_keeps_retriever_order():
    """mode='annotate' (the quality-gate fallback) attaches rerank_score but
    never reorders — the retriever ordering is served unchanged."""
    from tpu_rag.retrieval.rerank import rerank_hits

    class CE:
        def predict(self, pairs):
            import numpy as np
            return np.array([0.0, 10.0, 1.0], np.float32)

    hits = [{"rank": 1, "id": "a", "score": 0.01, "text": "a"},
            {"rank": 2, "id": "b", "score": 0.90, "text": "b"},
            {"rank": 3, "id": "c", "score": 0.50, "text": "c"}]
    out = rerank_hits(CE(), "q", [dict(h) for h in hits], mode="annotate")
    assert [h["id"] for h in out] == ["a", "b", "c"]
    assert all("rerank_score" in h for h in out)


def test_rerank_quality_gate_demotes_losing_ensemble(tmp_path):
    """RERANK_MODE=ensemble with a checkpoint whose own eval manifest shows
    ensemble recall@10 < biencoder recall@10 demotes to 'annotate' (VERDICT
    r4 weak #2: a reranker that lowers recall must not reorder); a winning
    manifest passes ensemble through."""
    import json

    from tpu_rag.config import Config
    from tpu_rag.engine import RagEngine

    class _FakeEnc:
        dim = 8

    def eng_with_manifest(bi, ens):
        ckdir = tmp_path / f"rr_{bi}_{ens}"
        ckdir.mkdir()
        (ckdir / "rerank.json").write_text(json.dumps({"results": [
            {"label": "biencoder_top20_no_rerank", "recall@10": bi},
            {"label": "ensemble_bi+trained_ce", "recall@10": ens},
        ]}))
        cfg = Config(persist_dir=str(tmp_path / "vs"),
                     kb_db_path=str(tmp_path / "db/kb.sqlite3"),
                     db_path=str(tmp_path / "db/app.sqlite3"),
                     docs_dir=str(tmp_path / "docs"),
                     index_dtype="float32", use_pallas=False,
                     rerank_mode="ensemble",
                     rerank_weights=str(ckdir / "ckpt"))
        return RagEngine(cfg, encoder=_FakeEnc(), cross_encoder=object(),
                         dispatcher=object())

    losing = eng_with_manifest(0.7039, 0.7014)
    assert losing._gated_rerank_mode() == "annotate"
    assert losing._gated_rerank_mode() == "annotate"  # cached verdict

    winning = eng_with_manifest(0.7039, 0.7101)
    assert winning._gated_rerank_mode() == "ensemble"

    # no manifest at all -> trust the operator
    cfg = Config(persist_dir=str(tmp_path / "vs2"),
                 kb_db_path=str(tmp_path / "db2/kb.sqlite3"),
                 db_path=str(tmp_path / "db2/app.sqlite3"),
                 docs_dir=str(tmp_path / "docs2"),
                 index_dtype="float32", use_pallas=False,
                 rerank_mode="ensemble",
                 rerank_weights=str(tmp_path / "nowhere/ckpt"))
    bare = RagEngine(cfg, encoder=_FakeEnc(), cross_encoder=object(),
                     dispatcher=object())
    assert bare._gated_rerank_mode() == "ensemble"

"""HTTP API tests: full route surface with a fake encoder + real index/stores.

Pattern borrowed from the reference's tests (fake vector backend + HTTP test
client — reference tests/test_kb_crud.py) but without monkeypatching module
globals: the engine takes injected components.
"""

import hashlib
import json

import numpy as np
import pytest

from tpu_rag.api.app import create_app
from tpu_rag.api.testclient import TestClient
from tpu_rag.config import Config
from tpu_rag.engine import RagEngine
from tpu_rag.llm.base import LLMBackend

DIM = 32


class FakeEncoder:
    """Deterministic hash embeddings — no model, instant."""

    dim = DIM

    def embed(self, texts):
        out = np.zeros((len(texts), DIM), np.float32)
        for i, t in enumerate(texts):
            for tok in t.lower().split():
                h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=4).digest(), "little")
                out[i, h % DIM] += 1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-9)


class FakeCrossEncoder:
    def predict(self, pairs):
        # score = token overlap
        scores = []
        for q, t in pairs:
            qs, ts = set(q.lower().split()), set(t.lower().split())
            scores.append(float(len(qs & ts)))
        return np.array(scores, np.float32)


class ScriptedBackend(LLMBackend):
    """Emits a scripted token stream (with <think> spans) for SSE tests."""

    name = "scripted"

    def __init__(self, tokens=None, text="scripted answer"):
        self.tokens = tokens
        self.text = text

    def complete(self, messages, **kw):
        return self.text

    def stream(self, messages, **kw):
        for t in self.tokens or [self.text]:
            yield t


class ScriptedDispatcher:
    def __init__(self, backend):
        self.backend = backend

    def generate(self, messages, *, stream=False, engine=None, **kw):
        kw.pop("temperature", None)
        if stream:
            return self.backend.stream(messages), self.backend.name
        return self.backend.complete(messages), self.backend.name


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
    engine = RagEngine(cfg, encoder=FakeEncoder(), cross_encoder=FakeCrossEncoder(),
                       dispatcher=ScriptedDispatcher(ScriptedBackend()))
    app = create_app(engine=engine)
    return app, engine, TestClient(app)


def test_health_and_config(env):
    app, engine, client = env
    r = client.get("/health")
    assert r.status_code == 200
    data = r.json()
    assert data["status"] == "ok"
    assert data["docs_count"] == 0
    assert data["index"]["kind"] == "flat"
    r = client.get("/config")
    assert r.json()["readonly_mode"] is False


def test_root_redirect(env):
    _, _, client = env
    r = client.get("/")
    assert r.status_code == 307
    assert r.headers["location"] == "/app/"


def test_docs_crud_lifecycle(env, tmp_path):
    app, engine, client = env
    # save
    r = client.post("/docs/save", json={"title": "Dragon Lore",
                                        "content": "dragons breathe fire in the mountains",
                                        "metadata": {"namespace": "lore"}})
    assert r.status_code == 200
    body = r.json()
    doc_id = body["id"]
    assert body["ok"] and doc_id.startswith("doc-")
    assert (tmp_path / "docs" / body["file"]).is_file()

    # background indexing happened -> vector search finds it
    assert engine.index.count() == 1
    r = client.post("/search", json={"query": "dragons fire", "k": 3})
    hits = r.json()["hits"]
    assert hits and hits[0]["id"] == doc_id
    assert r.json()["source"] == "chroma+db"

    # get
    r = client.get(f"/docs/{doc_id}")
    assert r.status_code == 200
    assert r.json()["title"] == "Dragon Lore"

    # list
    r = client.get("/docs/list")
    assert any(d["id"] == doc_id for d in r.json()["docs"])

    # put (update)
    r = client.put(f"/docs/{doc_id}", json={"title": "Dragon Lore",
                                            "content": "dragons sleep on gold hoards",
                                            "metadata": {"namespace": "lore"}})
    assert r.status_code == 200
    r = client.get(f"/docs/{doc_id}")
    assert "gold" in r.json()["content"]

    # delete
    r = client.delete(f"/docs/{doc_id}")
    assert r.json()["ok"]
    assert client.get(f"/docs/{doc_id}").status_code == 404
    assert engine.index.count() == 0

    # 404s
    assert client.get("/docs/nope").status_code == 404
    assert client.delete("/docs/nope").status_code == 404
    assert client.put("/docs/nope", json={"title": "x", "content": "y"}).status_code == 404


def test_docs_save_validation_error(env):
    _, _, client = env
    r = client.post("/docs/save", json={"title": "missing content"})
    assert r.status_code == 422


def test_dedup_skips_identical_content(env):
    app, engine, client = env
    payload = {"title": "Same", "content": "identical text body", "metadata": {}}
    client.post("/docs/save", json=payload)
    client.post("/docs/save", json={**payload, "title": "Same2"})
    # second save has identical content -> hash dedup skips reindexing
    assert engine.index.count() == 1


def test_source_key_versioning(env):
    app, engine, client = env
    client.post("/docs/save", json={"title": "Hero Bio", "content": "version one"})
    client.post("/docs/save", json={"title": "Hero Bio", "content": "version two"})
    assert engine.index.count() == 1  # old version replaced via source_key
    r = client.post("/search", json={"query": "version", "k": 2})
    texts = [h["text"] for h in r.json()["hits"]]
    assert texts == ["version two"]


def test_kb_upsert_and_search(env):
    _, _, client = env
    r = client.post("/kb/upsert", json={"source": "wiki", "ref_id": "1",
                                        "title": "Elf City", "content": "elves live in the forest city"})
    assert r.json()["ok"]
    r = client.post("/kb/search", json={"query": "forest", "k": 5})
    hits = r.json()["hits"]
    assert hits and hits[0]["id"] == "db:wiki:1"
    assert hits[0]["metadata"]["source"] == "wiki"
    # missing field -> 400
    assert client.post("/kb/upsert", json={"source": "w"}).status_code == 400
    assert client.post("/kb/search", json={}).status_code == 400


def test_search_rerank_and_highlight(env):
    app, engine, client = env
    client.post("/docs/save", json={"title": "A", "content": "the dragon guards treasure"})
    client.post("/docs/save", json={"title": "B", "content": "a knight rides north. the dragon sleeps."})
    r = client.post("/search", json={"query": "dragon", "k": 5,
                                     "rerank": True, "highlight": True})
    out = r.json()
    assert out["reranked"] is True
    assert all("rerank_score" in h for h in out["hits"])
    assert any(h.get("highlights") for h in out["hits"])
    assert "timings_ms" in out


def test_search_meta_filter(env):
    app, engine, client = env
    client.post("/docs/save", json={"title": "Real Lore", "content": "unique dragontale content"})
    client.post("/docs/save", json={"title": "Schema Notes", "content": "unique dragontale content extra",
                                    "metadata": {"namespace": "meta"}})
    r = client.post("/search", json={"query": "dragontale", "k": 5})
    ids = [h["id"] for h in r.json()["hits"]]
    titles = [h["metadata"].get("title") for h in r.json()["hits"]]
    assert "Schema Notes" not in titles
    # canonicality=meta disables the filter
    r = client.post("/search", json={"query": "dragontale", "k": 5, "canonicality": "meta"})
    # meta-namespaced doc has no canonicality tag, so vector filter yields none;
    # but the filter must not drop meta hits in this mode
    assert r.status_code == 200


def test_compose_blocking(env):
    app, engine, client = env
    client.post("/docs/save", json={"title": "Moon Temple",
                                    "content": "the moon temple stands on the silver cliff"})
    r = client.post("/compose", json={"query": "moon temple", "k": 3,
                                      "language": "en", "thread_id": "t1"})
    out = r.json()
    assert out["draft"] == "scripted answer"
    assert out["engine"] == "scripted"
    assert out["thread_id"] == "t1"
    assert out["language"] == "en"
    assert isinstance(out["citations"], list) and out["citations"]
    assert set(out["citations"][0]) == {"id", "file_path", "section"}
    # conversation was persisted
    msgs = client.get("/threads/t1/messages").json()["messages"]
    assert [m["role"] for m in msgs] == ["user", "assistant"]
    threads = client.get("/threads").json()["threads"]
    assert threads[0]["thread_id"] == "t1" and threads[0]["count"] == 2


def test_compose_no_hits_note(env):
    _, _, client = env
    r = client.post("/compose", json={"query": "zzzz unknown", "k": 3})
    out = r.json()
    assert out["draft"] == "" and "note" in out


def test_compose_stream_sse_with_think(env, tmp_path):
    app, engine, client = env
    engine.dispatcher = ScriptedDispatcher(ScriptedBackend(
        tokens=["<th", "ink>I reason", " secretly</думать".replace("думать", "think") + ">", "Visible ", "answer"]))
    client.post("/docs/save", json={"title": "Star Map", "content": "stars map the northern sky"})
    r = client.post("/compose_stream", json={"query": "stars map", "k": 3,
                                             "language": "en", "thread_id": "s1"})
    frames = "".join(r.iter_stream())
    events = []
    for block in frames.split("\n\n"):
        if block.startswith("data: "):
            events.append(json.loads(block[6:]))
        elif block.startswith("event: done"):
            events.append({"done": True})
    reasoning = "".join(e["data"] for e in events if e.get("type") == "reasoning")
    text = "".join(e["data"] for e in events if e.get("type") == "text")
    assert reasoning == "I reason secretly"
    assert text == "Visible answer"
    tail = [e for e in events if "citations" in e]
    assert tail and tail[0]["thread_id"] == "s1"
    assert events[-1] == {"done": True}
    # assistant message persisted without reasoning
    msgs = client.get("/threads/s1/messages").json()["messages"]
    assert msgs[-1]["content"] == "Visible answer"


def test_compose_stream_selected_ids(env):
    app, engine, client = env
    client.post("/docs/save", json={"title": "One", "content": "alpha beta"})
    client.post("/docs/save", json={"title": "Two", "content": "alpha gamma"})
    r = client.post("/compose_stream", json={"query": "alpha", "k": 5,
                                             "selected_ids": ["nonexistent-id"]})
    frames = "".join(r.iter_stream())
    tail = [json.loads(b[6:]) for b in frames.split("\n\n")
            if b.startswith("data: ") and "citations" in b]
    assert tail and tail[0]["citations"] == []


def test_auth_enforced(tmp_path):
    cfg = Config(
        persist_dir=str(tmp_path / "vs"),
        kb_db_path=str(tmp_path / "db/kb.sqlite3"),
        db_path=str(tmp_path / "db/app.sqlite3"),
        docs_dir=str(tmp_path / "docs"),
        api_key="sekrit",
        index_dtype="float32",
        use_pallas=False,
    )
    engine = RagEngine(cfg, encoder=FakeEncoder(),
                       dispatcher=ScriptedDispatcher(ScriptedBackend()))
    app = create_app(engine=engine)
    client = TestClient(app)
    assert client.get("/health").status_code == 401
    assert client.get("/health", headers={"x-api-key": "wrong"}).status_code == 401
    assert client.get("/health", headers={"x-api-key": "sekrit"}).status_code == 200
    # root redirect stays public
    assert client.get("/").status_code == 307


def test_readonly_mode_enforced(tmp_path):
    cfg = Config(
        persist_dir=str(tmp_path / "vs"),
        kb_db_path=str(tmp_path / "db/kb.sqlite3"),
        db_path=str(tmp_path / "db/app.sqlite3"),
        docs_dir=str(tmp_path / "docs"),
        readonly_mode=True,
        index_dtype="float32",
        use_pallas=False,
    )
    engine = RagEngine(cfg, encoder=FakeEncoder(),
                       dispatcher=ScriptedDispatcher(ScriptedBackend()))
    client = TestClient(create_app(engine=engine))
    r = client.post("/docs/save", json={"title": "x", "content": "y"})
    assert r.status_code == 403
    assert client.post("/kb/upsert", json={"source": "s", "ref_id": "1",
                                           "title": "t", "content": "c"}).status_code == 403
    # reads still work
    assert client.get("/docs/list").status_code == 200


def test_metrics_endpoint(env):
    _, _, client = env
    client.get("/health")
    client.post("/search", json={"query": "anything", "k": 2})
    r = client.get("/metrics")
    assert r.status_code == 200
    text = r.text
    assert "http_get_health_total" in text
    assert "http_post_search_total" in text
    assert "_seconds_sum" in text


def test_query_embed_cache(env):
    _, engine, client = env
    calls = []
    orig = engine.embed

    def counting(texts):
        calls.append(texts)
        return orig(texts)

    engine.embed = counting
    engine.query_vector("repeat me", 3, None, None)
    engine.query_vector("repeat me", 3, None, None)
    assert len(calls) == 1  # second query served from the LRU


def test_compose_with_llm_summarization(tmp_path):
    """summarize_mode=llm: per-chunk and history summarization flow through
    the dispatcher (reference api/app.py:467-523 semantics)."""
    from tpu_rag.llm.extractive import ExtractiveBackend

    cfg = Config(
        persist_dir=str(tmp_path / "vs"),
        kb_db_path=str(tmp_path / "db/kb.sqlite3"),
        db_path=str(tmp_path / "db/app.sqlite3"),
        docs_dir=str(tmp_path / "docs"),
        index_dtype="float32",
        use_pallas=False,
        summarize_mode="llm",
    )
    engine = RagEngine(cfg, encoder=FakeEncoder(),
                       dispatcher=ScriptedDispatcher(ExtractiveBackend()))
    client = TestClient(create_app(engine=engine))
    client.post("/docs/save", json={"title": "Star Atlas",
                                    "content": "the atlas charts every northern star"})
    # two turns on one thread -> history block + rolling summary exercised
    r1 = client.post("/compose", json={"query": "northern star atlas", "k": 2,
                                       "thread_id": "s", "language": "en"})
    assert r1.status_code == 200 and r1.json()["draft"]
    r2 = client.post("/compose", json={"query": "northern star atlas again", "k": 2,
                                       "thread_id": "s", "language": "en"})
    assert r2.status_code == 200
    assert engine.db.get_summary("s")  # rolling summary persisted


def test_search_batched_queries(env):
    app, engine, client = env
    client.post("/docs/save", json={"title": "A", "content": "alpha dragon topic"})
    client.post("/docs/save", json={"title": "B", "content": "beta knight topic"})
    r = client.post("/search", json={"queries": ["alpha dragon", "beta knight"],
                                     "k": 2, "highlight": True})
    assert r.status_code == 200
    out = r.json()
    assert len(out["results"]) == 2
    assert out["results"][0]["hits"][0]["metadata"]["title"] == "A"
    assert out["results"][1]["hits"][0]["metadata"]["title"] == "B"
    assert "timings_ms" in out
    # single-query shape unchanged
    r = client.post("/search", json={"query": "alpha dragon", "k": 2})
    assert "hits" in r.json() and "results" not in r.json()


def test_compose_extra_context_injection(env):
    """Client-supplied snippets flow into the prompt context
    (web UI snippet-injection mode)."""
    app, engine, client = env
    client.post("/docs/save", json={"title": "X", "content": "xylophone zebra facts"})

    captured = {}
    orig = engine.prepare_messages

    def spy(query, context, *a, **kw):
        captured["context"] = context
        return orig(query, context, *a, **kw)

    engine.prepare_messages = spy
    r = client.post("/compose", json={"query": "xylophone zebra", "k": 2,
                                      "extra_context": "[snip-1] the zebra plays at dusk"})
    assert r.status_code == 200
    assert "<<<CLIENT_SNIPPETS>>>" in captured["context"]
    assert "the zebra plays at dusk" in captured["context"]


def test_engine_warmup(env):
    _, engine, _ = env
    dt = engine.warmup(rerank=True)
    assert dt >= 0
    # warmup populated the query-embed cache path without errors
    assert engine.query_vector("warmup query", 5, None, None) == []


def test_search_fts_docs_flag(tmp_path):
    """FTS_DOCS=1 merges keyword hits from the docs FTS table (which the
    reference populates via the indexer but never searches).  Hits the
    vector pass already surfaced are not duplicated; FTS-sourced hits are
    tagged score_kind=bm25 so the ensemble reranker normalizes them as
    their own score family."""
    cfg = Config(
        persist_dir=str(tmp_path / "vs"),
        kb_db_path=str(tmp_path / "db/kb.sqlite3"),
        db_path=str(tmp_path / "db/app.sqlite3"),
        docs_dir=str(tmp_path / "docs"),
        index_dtype="float32",
        use_pallas=False,
        summarize_mode="off",
        fts_docs=True,
    )
    engine = RagEngine(cfg, encoder=FakeEncoder(), cross_encoder=FakeCrossEncoder(),
                       dispatcher=ScriptedDispatcher(ScriptedBackend()))
    app = create_app(engine=engine)
    client = TestClient(app)
    # a doc whose keyword matches but whose hash-embedding won't be the
    # vector top hit for the query term "glimmer"
    client.post("/docs/save", json={"title": "A", "content": "glimmer stone archive"})
    client.post("/docs/save", json={"title": "B", "content": "unrelated topic entirely"})
    import time as _t
    _t.sleep(0.3)  # background indexing
    r = client.post("/search", json={"query": "glimmer", "k": 5})
    assert r.status_code == 200
    hits = r.json()["hits"]
    assert any("glimmer" in h.get("text", "") for h in hits)
    fts_hits = [h for h in hits if (h.get("metadata") or {}).get("source") == "docs_fts"]
    for h in fts_hits:
        assert h["score_kind"] == "bm25"
    ids = [h["id"] for h in hits]
    assert len(ids) == len(set(ids))  # no dupes between vector and docs-FTS


def test_search_rerank_candidates_depth(tmp_path):
    """RERANK_CANDIDATES extension: when a /search asks to rerank, retrieve
    that many vector candidates for the cross-encoder (recall@k after rerank
    is ceilinged by retrieval recall@depth), then truncate back to k.  With
    the knob unset the reranker sees only what /search would return
    (reference parity)."""
    def build(cands):
        cfg = Config(
            persist_dir=str(tmp_path / f"vs{cands}"),
            kb_db_path=str(tmp_path / f"db{cands}/kb.sqlite3"),
            db_path=str(tmp_path / f"db{cands}/app.sqlite3"),
            docs_dir=str(tmp_path / f"docs{cands}"),
            index_dtype="float32",
            use_pallas=False,
            summarize_mode="off",
            rerank_candidates=cands,
        )
        engine = RagEngine(cfg, encoder=FakeEncoder(),
                           cross_encoder=FakeCrossEncoder(),
                           dispatcher=ScriptedDispatcher(ScriptedBackend()))
        app = create_app(engine=engine)
        client = TestClient(app)
        for i in range(40):
            client.post("/docs/save", json={
                "title": f"d{i}", "content": f"topic shard number alpha{i}"})
        import time as _t
        for _ in range(100):
            if engine.index.count() >= 40:
                break
            _t.sleep(0.05)
        seen = []
        orig = engine.rerank
        engine.rerank = lambda q, hits: seen.append(len(hits)) or orig(q, hits)
        return engine, client, seen

    engine, client, seen = build(30)
    r = client.post("/search", json={"query": "topic shard", "k": 3,
                                     "rerank": True})
    assert r.status_code == 200 and r.json()["reranked"]
    assert len(r.json()["hits"]) == 3          # truncated to the response k
    assert seen and seen[0] >= 30              # CE saw the deep candidates

    # knob off -> parity: reranker sees vector k + FTS k//2 at most
    engine0, client0, seen0 = build(0)
    r = client0.post("/search", json={"query": "topic shard", "k": 3,
                                      "rerank": True})
    assert r.status_code == 200
    assert seen0 and seen0[0] <= 4


def test_compose_stream_init_error_reaches_client(env, monkeypatch):
    """A failure during stream INIT must arrive as an SSE error event — the
    deferred generator used to close over the except variable, which CPython
    deletes when the block exits, so the pump thread raised NameError and
    clients got an empty stream."""
    app, engine, client = env

    def boom(*a, **k):
        raise RuntimeError("search exploded")

    monkeypatch.setattr(engine, "search_internal", boom)
    r = client.post("/compose_stream", json={"query": "anything", "k": 3})
    frames = "".join(r.iter_stream())
    assert "[compose_stream init error] search exploded" in frames


def test_compose_honors_selected_ids(env):
    """The blocking /compose applies the same selected_ids source filter as
    /compose_stream (it used to ignore it)."""
    app, engine, client = env
    client.post("/docs/save", json={"title": "One", "content": "alpha beta"})
    r = client.post("/compose", json={"query": "alpha", "k": 5,
                                      "selected_ids": ["nope"]})
    out = r.json()
    assert out["citations"] == [] and out["draft"] == ""


def test_bad_limit_and_k_are_client_errors(env):
    app, engine, client = env
    assert client.get("/threads?limit=abc").status_code == 400
    r = client.post("/kb/search", json={"query": "x", "k": "abc"})
    assert r.status_code == 400


def test_docs_save_same_title_same_second(env):
    """Two same-second saves of one title keep distinct files (the filename
    used to collide and the second write clobbered the first doc)."""
    app, engine, client = env
    a = client.post("/docs/save", json={"title": "Notes", "content": "first"}).json()
    b = client.post("/docs/save", json={"title": "Notes", "content": "second"}).json()
    assert a["file"] != b["file"]
    assert client.get(f"/docs/{a['id']}").json()["content"] == "first"
    assert client.get(f"/docs/{b['id']}").json()["content"] == "second"


def test_path_params_decode_once(env):
    """Percent-decoding happens exactly once: %2520 -> literal '%20' in the
    param (double-unquote turned it into a space)."""
    app, engine, client = env
    r = client.get("/docs/doc-a%2520b")
    assert r.status_code == 404  # decoded id is 'doc-a%20b', not 'doc-a b'

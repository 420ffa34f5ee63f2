"""ASGI layer + first-party HTTP server tests: real sockets, streaming,
keep-alive, CORS — the serving runtime the reference delegated to
uvicorn/FastAPI."""

import asyncio
import json
import socket
import threading
import time

import pytest

from tpu_rag.api.asgi import App, Response
from tpu_rag.api.server import HTTPServer


def make_app():
    app = App()

    @app.get("/ping", public=True)
    def ping():
        return {"pong": True}

    @app.post("/echo", public=True)
    def echo(body: dict):
        return {"got": body}

    @app.get("/stream", public=True)
    def stream():
        def gen():
            for i in range(3):
                yield f"data: {i}\n\n"
        return Response(stream=gen(), media_type="text/event-stream")

    @app.get("/items/{item_id}", public=True)
    def item(item_id: str):
        return {"id": item_id}

    @app.post("/search", public=True)
    def search(body: dict):
        # shape stub for the bench_http load generator test
        qs = body.get("queries") or [body.get("query", "")]
        return {"hits": [{"id": str(i), "text": q} for i, q in enumerate(qs)]}

    return app


@pytest.fixture(scope="module")
def server():
    app = make_app()
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    srv = HTTPServer(app, "127.0.0.1", port)
    thread = threading.Thread(target=srv.run, daemon=True)
    thread.start()
    # wait for the port to accept
    for _ in range(100):
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)
    yield f"http://127.0.0.1:{port}"


def test_get_over_socket(server):
    import requests

    r = requests.get(f"{server}/ping")
    assert r.status_code == 200
    assert r.json() == {"pong": True}
    assert r.headers["access-control-allow-origin"] == "*"


def test_post_json_and_path_params(server):
    import requests

    r = requests.post(f"{server}/echo", json={"a": 1, "字": "值"})
    assert r.json() == {"got": {"a": 1, "字": "值"}}
    r = requests.get(f"{server}/items/abc%20def")
    assert r.json() == {"id": "abc def"}


def test_404_and_keepalive(server):
    import requests

    s = requests.Session()
    assert s.get(f"{server}/nope").status_code == 404
    assert s.get(f"{server}/ping").status_code == 200  # same connection reused


def test_streaming_chunked(server):
    import requests

    with requests.get(f"{server}/stream", stream=True) as r:
        assert r.status_code == 200
        body = b"".join(r.iter_content(64))
    assert body.decode() == "data: 0\n\ndata: 1\n\ndata: 2\n\n"
    assert r.headers.get("transfer-encoding") == "chunked"


@pytest.mark.anyio
async def test_asgi_transport_httpx():
    httpx = pytest.importorskip("httpx")
    app = make_app()
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://test") as client:
        r = await client.get("/ping")
        assert r.json() == {"pong": True}
        r = await client.post("/echo", json={"x": 2})
        assert r.json() == {"got": {"x": 2}}


@pytest.fixture
def anyio_backend():
    return "asyncio"


def _infinite_stream_app():
    """App with an endless SSE route that records generator teardown."""
    app = App()
    closed = threading.Event()

    @app.get("/inf", public=True)
    def inf():
        def gen():
            try:
                i = 0
                while True:
                    yield f"data: {i}\n\n"
                    i += 1
            finally:
                closed.set()
        return Response(stream=gen(), media_type="text/event-stream")

    return app, closed


def _http_scope(path):
    return {"type": "http", "method": "GET", "path": path,
            "headers": [], "query_string": b""}


async def _abort_after_chunks(app, n_chunks, via_disconnect):
    """Drive one streaming request, aborting after n_chunks either by the
    receive channel announcing http.disconnect or by send() raising."""
    state = {"requests": 0, "bodies": 0}

    async def receive():
        if state["requests"] == 0:
            state["requests"] += 1
            return {"type": "http.request", "body": b"", "more_body": False}
        if via_disconnect:
            while state["bodies"] < n_chunks:
                await asyncio.sleep(0.005)
            return {"type": "http.disconnect"}
        await asyncio.sleep(3600)  # no further client messages
        return {"type": "http.disconnect"}

    async def send(msg):
        if msg["type"] == "http.response.body" and msg.get("body"):
            state["bodies"] += 1
            if not via_disconnect and state["bodies"] >= n_chunks:
                raise ConnectionResetError("client went away")

    await asyncio.wait_for(app(_http_scope("/inf"), receive, send), timeout=15)


@pytest.mark.anyio
@pytest.mark.parametrize("via_disconnect", [False, True])
async def test_stream_abort_closes_generator(via_disconnect):
    """Client abort mid-SSE must close() the upstream generator (which is the
    LLM stream in production) instead of leaking it — both when send()
    raises on a dead socket and when the server signals http.disconnect."""
    app, closed = _infinite_stream_app()
    await _abort_after_chunks(app, 3, via_disconnect)
    assert closed.wait(timeout=5), "stream generator finally-block never ran"


@pytest.mark.anyio
async def test_stream_abort_no_thread_leak():
    """Repeated aborts must not accumulate blocked pump threads (the round-1
    bug: pump blocked forever on a full queue once the consumer died)."""
    app, _ = _infinite_stream_app()
    await _abort_after_chunks(app, 2, False)  # warm the executor pool
    await asyncio.sleep(0.3)
    baseline = threading.active_count()
    for _ in range(10):
        await _abort_after_chunks(app, 2, False)
    deadline = time.time() + 8
    while time.time() < deadline and threading.active_count() > baseline + 2:
        await asyncio.sleep(0.1)
    growth = threading.active_count() - baseline
    assert growth <= 2, f"{growth} threads leaked across 10 aborted streams"


def test_concurrent_mixed_load_through_server(tmp_path):
    """8 client threads hammer the real socket server with mixed
    search/save/compose traffic — no 5xx, consistent state."""
    import requests as rq

    from tpu_rag.api.app import create_app
    from tpu_rag.config import Config
    from tpu_rag.engine import RagEngine
    from tests.test_api import FakeEncoder, ScriptedBackend, ScriptedDispatcher

    cfg = Config(
        persist_dir=str(tmp_path / "vs"),
        kb_db_path=str(tmp_path / "db/kb.sqlite3"),
        db_path=str(tmp_path / "db/app.sqlite3"),
        docs_dir=str(tmp_path / "docs"),
        index_dtype="float32", use_pallas=False, summarize_mode="off",
    )
    engine = RagEngine(cfg, encoder=FakeEncoder(),
                       dispatcher=ScriptedDispatcher(ScriptedBackend()))
    app = create_app(engine=engine)

    sock = socket.socket(); sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]; sock.close()
    srv = HTTPServer(app, "127.0.0.1", port)
    threading.Thread(target=srv.run, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            rq.get(base + "/health", timeout=0.5); break
        except Exception:
            time.sleep(0.05)

    errors = []

    def worker(t):
        s = rq.Session()
        try:
            for i in range(6):
                r = s.post(base + "/docs/save", timeout=30, json={
                    "title": f"Doc {t}-{i}", "content": f"thread {t} item {i} words"})
                assert r.status_code == 200, r.text
                r = s.post(base + "/search", timeout=30,
                           json={"query": f"thread {t} item", "k": 3})
                assert r.status_code == 200, r.text
                r = s.post(base + "/compose", timeout=30, json={
                    "query": f"thread {t} item {i} words", "k": 2,
                    "thread_id": f"load-{t}"})
                assert r.status_code == 200, r.text
        except Exception as e:
            errors.append(f"t{t}: {e}")

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    h = rq.get(base + "/health", timeout=5).json()
    assert h["docs_count"] == 48
    m = rq.get(base + "/metrics", timeout=5).text
    assert "http_post_search_total" in m  # per-route counters flowed


def test_bench_http_multiprocess_load(server):
    """The load generator shards its threads over N client processes (one
    Python process GIL-caps near ~1K req/s — it must not be the limiter
    when measuring the server)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "bench_http.py"),
         "--base", server, "--mode", "single", "--concurrency", "8",
         "--duration", "1.5", "--warmup", "0.2", "--procs", "2"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["procs"] == 2
    assert res["requests_failed"] == 0
    assert res["requests_ok"] > 0
    assert res["qps"] > 0
    assert res["p50_ms"] is not None


def test_path_param_decoded_exactly_once(server):
    import requests

    # %2520 on the wire -> server unquotes once -> handler sees literal '%20'
    r = requests.get(f"{server}/items/a%2520b")
    assert r.status_code == 200
    assert r.json() == {"id": "a%20b"}


def test_chunked_request_body_rejected_loudly(server):
    """Transfer-Encoding: chunked isn't implemented: the server answers 501
    and closes instead of reading an empty body and desyncing keep-alive."""
    import urllib.parse

    host = urllib.parse.urlsplit(server).netloc
    hostname, port = host.split(":")
    s = socket.create_connection((hostname, int(port)), timeout=5)
    s.sendall(b"POST /echo HTTP/1.1\r\nhost: x\r\n"
              b"transfer-encoding: chunked\r\n"
              b"content-type: application/json\r\n\r\n"
              b"2\r\n{}\r\n0\r\n\r\n")
    data = s.recv(4096)
    assert b"501" in data.split(b"\r\n")[0]
    s.close()


def test_real_disconnect_stops_stream_watcher(server):
    """receive() reports an actual EOF as http.disconnect (the old code
    slept 3600s then fabricated one, truncating live streams at the 1-hour
    mark and never noticing real aborts)."""
    import urllib.parse

    host = urllib.parse.urlsplit(server).netloc
    hostname, port = host.split(":")
    s = socket.create_connection((hostname, int(port)), timeout=5)
    s.sendall(b"GET /stream HTTP/1.1\r\nhost: x\r\n\r\n")
    s.recv(64)     # headers + first chunk under way
    s.close()      # abort mid-stream: the watcher must see EOF, not hang
    # the server must keep answering new connections afterwards
    import requests

    r = requests.get(f"{server}/ping", timeout=5)
    assert r.status_code == 200

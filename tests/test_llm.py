"""LLM backend tests against stub HTTP servers: Ollama chat->generate 404
fallback, NDJSON streaming, OpenAI SSE parsing, dispatcher priority fallback
(none of which the reference tested — SURVEY.md §4)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from tpu_rag.config import Config
from tpu_rag.llm.dispatch import LLMDispatcher
from tpu_rag.llm.ollama import OllamaBackend
from tpu_rag.llm.openai_backend import OpenAIBackend

MESSAGES = [{"role": "user", "content": "hi"}]


def _serve(handler_cls):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


class OllamaStub(BaseHTTPRequestHandler):
    chat_enabled = True

    def do_POST(self):
        length = int(self.headers.get("content-length", 0))
        body = json.loads(self.rfile.read(length))
        if self.path == "/api/chat":
            if not self.chat_enabled:
                self.send_response(404)
                self.end_headers()
                return
            payload = {"message": {"content": f"chat:{body['model']}"}}
        elif self.path == "/api/generate":
            if body.get("stream"):
                self.send_response(200)
                self.send_header("content-type", "application/x-ndjson")
                self.end_headers()
                for tok in ("to", "ken", "s"):
                    self.wfile.write(json.dumps({"response": tok}).encode() + b"\n")
                return
            payload = {"response": f"gen:{body['model']}"}
        else:
            self.send_response(404)
            self.end_headers()
            return
        data = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("content-type", "application/json")
        self.send_header("content-length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


class OllamaNoChatStub(OllamaStub):
    chat_enabled = False


def test_ollama_chat_complete():
    srv, url = _serve(OllamaStub)
    try:
        b = OllamaBackend(url, "m1")
        assert b.complete(MESSAGES) == "chat:m1"
    finally:
        srv.shutdown()


def test_ollama_404_falls_back_to_generate():
    srv, url = _serve(OllamaNoChatStub)
    try:
        b = OllamaBackend(url, "m1", use_chat=True)
        assert b.complete(MESSAGES) == "gen:m1"
        assert b.use_chat is False  # sticky fallback (reference api/llm.py:116-121)
    finally:
        srv.shutdown()


def test_ollama_stream_ndjson():
    srv, url = _serve(OllamaNoChatStub)
    try:
        b = OllamaBackend(url, "m1", use_chat=False)
        assert "".join(b.stream(MESSAGES)) == "tokens"
    finally:
        srv.shutdown()


class OpenAIStub(BaseHTTPRequestHandler):
    def do_POST(self):
        length = int(self.headers.get("content-length", 0))
        body = json.loads(self.rfile.read(length))
        assert self.headers.get("authorization", "").startswith("Bearer ")
        if body.get("stream"):
            self.send_response(200)
            self.send_header("content-type", "text/event-stream")
            self.end_headers()
            for tok in ("he", "llo"):
                frame = {"choices": [{"delta": {"content": tok}}]}
                self.wfile.write(b"data: " + json.dumps(frame).encode() + b"\n\n")
            self.wfile.write(b"data: [DONE]\n\n")
            return
        data = json.dumps({"choices": [{"message": {"content": "full answer"}}]}).encode()
        self.send_response(200)
        self.send_header("content-type", "application/json")
        self.send_header("content-length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


def test_openai_complete_and_stream():
    srv, url = _serve(OpenAIStub)
    try:
        b = OpenAIBackend("sk-test", "gpt-x", base_url=url)
        assert b.complete(MESSAGES) == "full answer"
        assert "".join(b.stream(MESSAGES)) == "hello"
    finally:
        srv.shutdown()


def test_dispatcher_priority_fallback(tmp_path):
    """ollama unreachable -> falls through to extractive."""
    cfg = Config(ollama_host="http://127.0.0.1:9", ollama_model="m",
                 model_priority=("ollama", "extractive"))
    d = LLMDispatcher(cfg)
    out, name = d.generate([{"role": "user", "content": "plain text question"}])
    assert name == "extractive"
    assert out


def test_dispatcher_all_failed():
    cfg = Config(ollama_host="http://127.0.0.1:9", ollama_model="m",
                 openai_api_key="", model_priority=("ollama", "openai"))
    d = LLMDispatcher(cfg)
    with pytest.raises(RuntimeError, match="All backends failed"):
        d.generate(MESSAGES)


def test_dispatcher_explicit_engine():
    cfg = Config(model_priority=("ollama",))
    d = LLMDispatcher(cfg)
    out, name = d.generate(MESSAGES, engine="extractive")
    assert name == "extractive"


def test_dispatcher_stream_fallback_primes_first_chunk():
    """Streaming fallback actually works: backend.stream() is a generator
    function whose connection error only fires at iteration time — the
    dispatcher primes the first chunk so stream-start failures fall through
    to the next backend instead of leaking into the SSE loop."""
    cfg = Config(ollama_host="http://127.0.0.1:9", ollama_model="m",
                 model_priority=("ollama", "extractive"))
    d = LLMDispatcher(cfg)
    stream, name = d.generate(
        [{"role": "user", "content": "plain text question"}], stream=True)
    assert name == "extractive"
    assert "".join(stream)


def test_ollama_mid_stream_error_raises():
    """A 200-status NDJSON line {"error": ...} mid-stream must raise, not end
    the stream as if it completed."""
    import http.server
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers.get("content-length", 0)))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(
                b'{"message": {"content": "par"}}\n'
                b'{"error": "model blew up"}\n')

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        b = OllamaBackend(f"http://127.0.0.1:{srv.server_port}", "m")
        chunks = []
        with pytest.raises(RuntimeError, match="model blew up"):
            for c in b.stream(MESSAGES):
                chunks.append(c)
        assert chunks == ["par"]
    finally:
        srv.shutdown()

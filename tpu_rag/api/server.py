"""First-party asyncio HTTP/1.1 server hosting an ASGI app.

Replaces uvicorn in the reference deployment (reference Dockerfile:34,
run.txt:4).  Supports: request bodies via Content-Length, keep-alive,
chunked transfer encoding for streaming responses (SSE), graceful handling
of client disconnects.  Intentionally minimal — no TLS, no HTTP/2; put a
proxy in front for those.
"""

from __future__ import annotations

import asyncio
import logging
from urllib.parse import unquote, urlsplit

logger = logging.getLogger(__name__)

MAX_HEADER_BYTES = 64 * 1024
MAX_BODY_BYTES = 64 * 1024 * 1024

REASONS = {
    200: "OK", 302: "Found", 307: "Temporary Redirect", 400: "Bad Request",
    401: "Unauthorized", 403: "Forbidden", 404: "Not Found",
    422: "Unprocessable Entity", 500: "Internal Server Error",
}


class HTTPServer:
    def __init__(self, app, host: str = "0.0.0.0", port: int = 8000,
                 executor_workers: int = 128) -> None:
        self.app = app
        self.host = host
        self.port = port
        # handler thread pool size.  asyncio's default executor is
        # min(32, cpus + 4) threads — on a 1-vCPU host that caps concurrent
        # in-flight requests (and the microbatch window fill) at ~5.
        # Handler threads spend their time blocked on the device RTT, so a
        # large pool costs only stack memory.
        self.executor_workers = max(4, int(executor_workers))
        self._server: asyncio.AbstractServer | None = None

    async def _handle_connection(self, reader: asyncio.StreamReader,
                                 writer: asyncio.StreamWriter) -> None:
        try:
            while True:
                keep_alive = await self._handle_one(reader, writer)
                if not keep_alive:
                    break
        except (ConnectionResetError, BrokenPipeError, asyncio.IncompleteReadError):
            pass
        except Exception as e:
            logger.warning("connection error: %s", e)
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    async def _handle_one(self, reader, writer) -> bool:
        try:
            head = await reader.readuntil(b"\r\n\r\n")
        except asyncio.IncompleteReadError:
            return False
        except asyncio.LimitOverrunError:
            return False
        if len(head) > MAX_HEADER_BYTES:
            return False
        lines = head.decode("latin-1").split("\r\n")
        request_line = lines[0]
        parts = request_line.split(" ")
        if len(parts) != 3:
            return False
        method, target, version = parts
        headers: list[tuple[bytes, bytes]] = []
        hmap: dict[str, str] = {}
        for line in lines[1:]:
            if not line or ":" not in line:
                continue
            k, _, v = line.partition(":")
            k = k.strip().lower()
            v = v.strip()
            headers.append((k.encode("latin-1"), v.encode("latin-1")))
            hmap[k] = v

        if "chunked" in hmap.get("transfer-encoding", "").lower():
            # chunked request decoding is not implemented: answer loudly and
            # close — silently reading an empty body desynchronized the
            # keep-alive connection (the chunk framing bytes were parsed as
            # the next request line)
            writer.write(b"HTTP/1.1 501 Not Implemented\r\n"
                         b"content-length: 0\r\nconnection: close\r\n\r\n")
            await writer.drain()
            return False
        length = int(hmap.get("content-length", "0") or 0)
        if length > MAX_BODY_BYTES:
            return False
        body = await reader.readexactly(length) if length else b""

        split = urlsplit(target)
        path = unquote(split.path)
        scope = {
            "type": "http",
            "asgi": {"version": "3.0"},
            "http_version": version.split("/")[-1],
            "method": method.upper(),
            "path": path,
            "raw_path": split.path.encode("latin-1"),
            "query_string": split.query.encode("latin-1"),
            "headers": headers,
            "client": writer.get_extra_info("peername"),
            "server": (self.host, self.port),
            "scheme": "http",
        }

        received = False
        pipelined = bytearray()

        async def receive():
            nonlocal received
            if received:
                # Report REAL disconnects: block until EOF on the read side.
                # (The old fixed 3600s sleep fabricated a disconnect that
                # truncated any live stream at the 1-hour mark, while actual
                # disconnects went unreported until a write failed.)  Bytes
                # that arrive instead of EOF — a pipelined next request —
                # are re-fed to the reader after the response completes.
                while True:
                    chunk = await reader.read(4096)
                    if not chunk:
                        return {"type": "http.disconnect"}
                    pipelined.extend(chunk)
            received = True
            return {"type": "http.request", "body": body, "more_body": False}

        state = {"started": False, "chunked": False}

        async def send(message):
            if message["type"] == "http.response.start":
                status = message["status"]
                out_headers = list(message.get("headers", []))
                names = {k.lower() for k, _ in out_headers}
                has_len = b"content-length" in names
                # Streamed responses (no content-length) use chunked encoding.
                if not has_len:
                    state["chunked"] = True
                    out_headers.append((b"transfer-encoding", b"chunked"))
                out_headers.append((b"connection", b"keep-alive"))
                head_lines = [f"HTTP/1.1 {status} {REASONS.get(status, 'OK')}".encode("latin-1")]
                for k, v in out_headers:
                    head_lines.append(k + b": " + v)
                writer.write(b"\r\n".join(head_lines) + b"\r\n\r\n")
                state["started"] = True
                await writer.drain()
            elif message["type"] == "http.response.body":
                data = message.get("body", b"")
                if state["chunked"]:
                    if data:
                        writer.write(f"{len(data):x}\r\n".encode("latin-1") + data + b"\r\n")
                    if not message.get("more_body"):
                        writer.write(b"0\r\n\r\n")
                else:
                    writer.write(data)
                await writer.drain()

        # ASGI apps normally set content-length themselves; ours doesn't, so
        # wrap send to inject it for non-streaming responses.
        buffered: dict = {}

        async def send_with_length(message):
            if message["type"] == "http.response.start":
                buffered["start"] = message
                return
            if "start" in buffered:
                start = buffered.pop("start")
                if not message.get("more_body"):
                    start["headers"] = list(start.get("headers", [])) + [
                        (b"content-length", str(len(message.get("body", b""))).encode())
                    ]
                await send(start)
            await send(message)

        await self.app(scope, receive, send_with_length)
        if pipelined:
            # hand pipelined bytes back so the keep-alive loop parses them
            reader.feed_data(bytes(pipelined))
        return hmap.get("connection", "").lower() != "close"

    async def serve(self) -> None:
        from concurrent.futures import ThreadPoolExecutor

        asyncio.get_running_loop().set_default_executor(
            ThreadPoolExecutor(max_workers=self.executor_workers,
                               thread_name_prefix="http-handler"))
        self._server = await asyncio.start_server(
            self._handle_connection, self.host, self.port,
            limit=MAX_HEADER_BYTES,
        )
        addrs = ", ".join(str(s.getsockname()) for s in self._server.sockets)
        logger.info("serving on %s", addrs)

        # graceful shutdown on SIGTERM/SIGINT: stop accepting, let in-flight
        # requests finish (abrupt kills mid-device-computation can wedge
        # tunneled accelerator runtimes — see .claude/skills/verify/SKILL.md)
        stop = asyncio.Event()
        loop = asyncio.get_running_loop()
        # exposed for programmatic shutdown (stop()) from another thread
        self._stop_event = stop
        self._loop = loop
        try:
            import signal

            for sig in (signal.SIGTERM, signal.SIGINT):
                loop.add_signal_handler(sig, stop.set)
        except (NotImplementedError, RuntimeError):
            pass  # platforms without signal handler support

        async with self._server:
            serve_task = asyncio.create_task(self._server.serve_forever())
            stop_task = asyncio.create_task(stop.wait())
            done, _ = await asyncio.wait({serve_task, stop_task},
                                         return_when=asyncio.FIRST_COMPLETED)
            if stop_task in done:
                logger.info("shutdown signal received; draining connections")
                self._server.close()
                await self._server.wait_closed()
                # give streaming responses a moment to flush
                await asyncio.sleep(0.2)
                serve_task.cancel()

    def run(self) -> None:
        try:
            asyncio.run(self.serve())
        except (KeyboardInterrupt, asyncio.CancelledError):
            pass

    def stop(self) -> None:
        """Programmatic graceful shutdown — same drain path as SIGTERM.
        Lets an embedding process (bench, tests) stop a server thread and
        drop its reference to the engine (and the device arrays it holds)."""
        loop = getattr(self, "_loop", None)
        ev = getattr(self, "_stop_event", None)
        if loop is not None and ev is not None:
            try:
                loop.call_soon_threadsafe(ev.set)
            except RuntimeError:
                pass  # loop already closed


def run_app(app, host: str = "0.0.0.0", port: int = 8000,
            executor_workers: int = 128) -> None:
    HTTPServer(app, host, port, executor_workers=executor_workers).run()

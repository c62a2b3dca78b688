"""HTTP front-end for the continuous-batching engine.

Stdlib-only (``http.server`` + threads — the image has no
uvicorn/fastapi, and the hot path is the TPU program anyway: the server
just moves requests into the engine and results out).  The reference
has no serving stack at all (its generate() is a blocking HF call,
modeling_desta25.py:1419-1427); this is the TPU-native framework's
production surface on top of ``ContinuousBatchingEngine``.

API (JSON in/out):

  GET  /v1/health            -> {"status": "ok", "slots": N, ...}
  POST /v1/generate          body: {"messages": [...] (generate()'s
                             schema), "max_new_tokens", "temperature",
                             "top_p", "do_sample", "deadline_s",
                             "stream": false}
                             -> {"id", "text", "tokens",
                                 "finish_reason", "truncated"}
       With "stream": true the response is text/event-stream; each
       accepted token arrives as `data: {"token": id, "text": piece}`
       and the final event is `data: {"done": true, "finish_reason":
       ...}` (per-tick granularity — the engine syncs the host once per
       tick, so tokens arrive in tick-sized bursts).
  DELETE /v1/requests/<id>   -> {"cancelled": true|false}

Concurrency model: ONE engine thread owns every engine call (submit /
step / cancel run under ``self._lock``; jax dispatch stays
single-threaded), driven in a tick loop that sleeps only when idle.
HTTP handler threads (ThreadingHTTPServer) block on per-request result
events — N concurrent HTTP clients batch into the engine's slots, which
is the whole point of continuous batching.

Audio: requests reference server-visible audio paths (the reference's
generate() contract — filepaths, modeling_desta25.py:1491-1510), or
inline base64 WAV via {"audio_b64": ...} in place of {"audio": path}.
"""

from __future__ import annotations

import base64
import json
import logging
import queue
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)


class EngineServer:
    """Owns the engine thread + per-request plumbing."""

    def __init__(self, engine, idle_sleep_s: float = 0.005):
        self.engine = engine
        self._lock = threading.Lock()
        self._events: Dict[int, threading.Event] = {}
        self._streams: Dict[int, "queue.Queue"] = {}
        self._idle_sleep_s = idle_sleep_s
        self._stop = threading.Event()
        engine.on_token = self._on_token
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- engine thread -----------------------------------------------------

    def _on_token(self, rid: int, tok: int):
        q = self._streams.get(rid)
        if q is not None:
            q.put(tok)

    def _run(self):
        while not self._stop.is_set():
            with self._lock:
                busy = (bool(self.engine.queue)
                        or any(r is not None for r in self.engine.slot_req))
                finished = self.engine.step() if busy else []
                for rid in finished:
                    ev = self._events.pop(rid, None)
                    if ev is not None:
                        ev.set()
                    q = self._streams.get(rid)
                    if q is not None:
                        q.put(None)  # stream sentinel
            if not busy:
                time.sleep(self._idle_sleep_s)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # -- request plumbing ----------------------------------------------------

    def submit(self, messages, *, stream: bool = False,
               **kw) -> int:
        ev = threading.Event()
        with self._lock:
            rid = self.engine.submit(messages, **kw)
            self._events[rid] = ev
            if stream:
                self._streams[rid] = queue.Queue()
        return rid

    def wait(self, rid: int, timeout: Optional[float] = None
             ) -> Dict[str, Any]:
        ev = self._events.get(rid)
        if ev is not None and not ev.wait(timeout):
            raise TimeoutError(f"request {rid} still running")
        with self._lock:
            return self.engine.results()[rid]

    def result_now(self, rid: int) -> Optional[Dict[str, Any]]:
        with self._lock:
            return self.engine.results().get(rid)

    def cancel(self, rid: int) -> bool:
        with self._lock:
            ok = self.engine.cancel(rid)
        if ok:
            ev = self._events.pop(rid, None)
            if ev is not None:
                ev.set()
            q = self._streams.get(rid)
            if q is not None:
                q.put(None)
        return ok

    def stream_tokens(self, rid: int):
        """Yield token ids until the request finishes (None sentinel)."""
        q = self._streams[rid]
        try:
            while True:
                tok = q.get()
                if tok is None:
                    return
                yield tok
        finally:
            self._streams.pop(rid, None)


def _decode_inline_audio(messages: List[Dict[str, Any]],
                         scratch: List[str]) -> List[Dict[str, Any]]:
    """Replace {"audio_b64": ...} entries with temp wav files."""
    out = []
    for m in messages:
        m = dict(m)
        if m.get("audios"):
            auds = []
            for a in m["audios"]:
                a = dict(a)
                if "audio_b64" in a:
                    f = tempfile.NamedTemporaryFile(
                        suffix=".wav", delete=False)
                    f.write(base64.b64decode(a.pop("audio_b64")))
                    f.close()
                    a["audio"] = f.name
                    scratch.append(f.name)
                auds.append(a)
            m["audios"] = auds
        out.append(m)
    return out


def make_handler(server: EngineServer, tokenizer):

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet; use logging
            logger.debug("http: " + fmt, *args)

        def _json(self, code: int, obj: Dict[str, Any]):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/v1/health":
                eng = server.engine
                self._json(200, {
                    "status": "ok",
                    "slots": eng.n_slots,
                    "active": sum(r is not None for r in eng.slot_req),
                    "queued": len(eng.queue),
                })
            else:
                self._json(404, {"error": "not found"})

        def do_DELETE(self):
            if self.path.startswith("/v1/requests/"):
                try:
                    rid = int(self.path.rsplit("/", 1)[1])
                except ValueError:
                    self._json(400, {"error": "bad request id"})
                    return
                self._json(200, {"cancelled": server.cancel(rid)})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                messages = req["messages"]
            except (json.JSONDecodeError, KeyError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            scratch: List[str] = []
            try:
                messages = _decode_inline_audio(messages, scratch)
                kw = {}
                for k in ("max_new_tokens", "temperature", "top_p",
                          "do_sample", "deadline_s"):
                    if k in req:
                        kw[k] = req[k]
                stream = bool(req.get("stream", False))
                rid = server.submit(messages, stream=stream, **kw)
            except Exception as e:  # noqa: BLE001 (bad audio, overflow)
                self._json(400, {"error": str(e)})
                return
            finally:
                import os
                for p in scratch:
                    try:
                        os.unlink(p)
                    except OSError:
                        pass
            if not stream:
                info = server.wait(rid)
                self._json(200, {"id": rid, **info})
                return
            # SSE stream
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def emit(obj):
                data = f"data: {json.dumps(obj)}\n\n".encode()
                chunk = f"{len(data):x}\r\n".encode() + data + b"\r\n"
                self.wfile.write(chunk)
                self.wfile.flush()

            try:
                for tok in server.stream_tokens(rid):
                    emit({"token": int(tok),
                          "text": tokenizer.decode(
                              [tok], skip_special_tokens=True)})
                info = server.result_now(rid) or {}
                emit({"done": True,
                      "finish_reason": info.get("finish_reason", ""),
                      "truncated": info.get("truncated", False),
                      "text": info.get("text", "")})
                self.wfile.write(b"0\r\n\r\n")
            except (BrokenPipeError, ConnectionResetError):
                server.cancel(rid)  # client went away: free the slot

    return Handler


def serve_http(engine, host: str = "127.0.0.1", port: int = 8000):
    """Blocking server entry.  Returns (httpd, engine_server) when used
    programmatically via ``start_http`` instead."""
    httpd, es = start_http(engine, host, port)
    try:
        httpd.serve_forever()
    finally:
        es.close()


def start_http(engine, host: str = "127.0.0.1", port: int = 0):
    """Non-blocking: start the engine thread + HTTP server thread;
    returns (httpd, engine_server).  port=0 picks an ephemeral port
    (httpd.server_address[1])."""
    es = EngineServer(engine)
    handler = make_handler(es, engine.model.tokenizer)
    httpd = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, es

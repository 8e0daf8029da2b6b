"""API gateway process — the DCN side of the two-process topology.

SURVEY §2.1/§5: collectives ride ICI *inside* the engine process; "DCN/HTTP
only from API/worker control plane into the engine". This module is that
control-plane hop as its own process (the reference splits the same way:
API container ↔ worker containers over the compose network,
docker-compose.yml:5-40 — there the transport is Redis, here it is the
HTTP/JSON contract the engine already speaks):

    client ──HTTP──► gateway (this process, stateless)
                      │  bounded retry + reconnect across engine restarts
                      └─HTTP/DCN──► engine process (owns TPU, index, chains)

What the gateway adds over pointing clients at the engine directly:

- **restart tolerance**: engine kills/redeploys surface as a short retry
  window, not connection-refused; the engine restores persisted chains +
  autoloaded index on boot, so job state survives (tests/test_engine_rpc.py
  kills the engine mid-session and keeps using the same job ids),
- **health demarcation**: ``/gateway/health`` separates "gateway up,
  engine down" from "all down" for load balancers,
- **isolation**: client connections terminate in a process with no JAX
  runtime — an engine OOM/restart can't drop the listening socket.

Stdlib only (ThreadingHTTPServer + urllib), matching api/http.py.
"""

from __future__ import annotations

import http.client
import json
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

#: hop-by-hop headers never forwarded (RFC 7230 §6.1)
_HOP_HEADERS = {
    "connection", "keep-alive", "proxy-authenticate", "proxy-authorization",
    "te", "trailers", "transfer-encoding", "upgrade", "host",
    "content-length",
}


class Gateway:
    def __init__(self, engine_url: str, retry_window_s: float = 20.0,
                 retry_interval_s: float = 0.5, timeout_s: float = 120.0):
        self.engine_url = engine_url.rstrip("/")
        self.retry_window_s = retry_window_s
        self.retry_interval_s = retry_interval_s
        self.timeout_s = timeout_s
        self._lock = threading.Lock()
        self.stats = {
            "proxied": 0, "engine_errors": 0, "retried": 0,
            "unavailable_503": 0, "started_at": time.time(),
        }

    # ------------------------------------------------------------ engine IO
    def _forward_once(self, method: str, path: str, body: bytes,
                      headers: dict):
        req = urllib.request.Request(
            self.engine_url + path, data=body if body else None,
            method=method,
        )
        for key, value in headers.items():
            if key.lower() not in _HOP_HEADERS:
                req.add_header(key, value)
        try:
            resp = urllib.request.urlopen(req, timeout=self.timeout_s)
            return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as err:
            # engine answered with an error status — a real response,
            # forwarded verbatim (not a reachability failure)
            return err.code, dict(err.headers or {}), err.read()

    def forward(self, method: str, path: str, body: bytes, headers: dict):
        """Forward with bounded retry across engine unavailability windows
        (the restart case). Only reachability failures retry — and only for
        idempotent-safe situations: non-GET requests retry solely on
        connection-refused (the request never reached the engine)."""
        deadline = time.time() + self.retry_window_s
        attempt = 0
        while True:
            try:
                status, hdrs, payload = self._forward_once(
                    method, path, body, headers)
                with self._lock:
                    self.stats["proxied"] += 1
                    if attempt:
                        self.stats["retried"] += 1
                return status, hdrs, payload
            except (urllib.error.URLError, ConnectionError, TimeoutError) as err:
                with self._lock:
                    self.stats["engine_errors"] += 1
                reason = getattr(err, "reason", err)
                # connection-refused is the only failure that PROVES the
                # request never reached the engine; anything else (timeout,
                # reset mid-flight) may have executed — don't replay non-GETs
                never_reached = isinstance(
                    reason, ConnectionRefusedError
                ) or isinstance(err, ConnectionRefusedError)
                if (method != "GET" and not never_reached) \
                        or time.time() >= deadline:
                    with self._lock:
                        self.stats["unavailable_503"] += 1
                    detail = {"detail": "engine unavailable",
                              "error": str(err)}
                    return 503, {"Content-Type": "application/json"}, \
                        json.dumps(detail).encode()
                attempt += 1
                time.sleep(self.retry_interval_s)

    def engine_alive(self) -> bool:
        try:
            status, _, _ = self._forward_once("GET", "/health", b"", {})
            return status < 500
        except Exception:  # noqa: BLE001 — any failure means unreachable
            return False

    def health(self) -> dict:
        with self._lock:
            stats = dict(self.stats)
        return {
            "gateway": "healthy",
            "engine_url": self.engine_url,
            "engine_reachable": self.engine_alive(),
            "uptime_s": round(time.time() - stats.pop("started_at"), 1),
            **stats,
        }


def make_handler(gateway: Gateway):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):  # quiet by default
            pass

        def _respond(self, status: int, headers: dict, payload: bytes):
            self.send_response(status)
            for key, value in headers.items():
                if key.lower() not in _HOP_HEADERS:
                    self.send_header(key, value)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _proxy_stream(self):
            """Pump an SSE response through without buffering: the
            buffered path would hold every event until the stream ends
            (and its GET retry-on-timeout would open a second stream)."""
            req = urllib.request.Request(
                gateway.engine_url + self.path, method="GET")
            for key, value in self.headers.items():
                if key.lower() not in _HOP_HEADERS:
                    req.add_header(key, value)
            try:
                resp = urllib.request.urlopen(
                    req, timeout=gateway.timeout_s)
            except urllib.error.HTTPError as err:
                self._respond(err.code, dict(err.headers or {}),
                              err.read())
                return
            except (urllib.error.URLError, ConnectionError,
                    TimeoutError) as err:
                with gateway._lock:
                    gateway.stats["unavailable_503"] += 1
                self._respond(503, {"Content-Type": "application/json"},
                              json.dumps({"detail": "engine unavailable",
                                          "error": str(err)}).encode())
                return
            with gateway._lock:
                gateway.stats["proxied"] += 1
            self.send_response(resp.status)
            for key, value in resp.headers.items():
                if key.lower() not in _HOP_HEADERS:
                    self.send_header(key, value)
            self.send_header("Connection", "close")
            self.end_headers()
            try:
                for line in resp:
                    self.wfile.write(line)
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away
            except (OSError, TimeoutError, http.client.HTTPException):
                # engine died or stalled MID-stream (the restart case):
                # headers are already sent, so surface an SSE error event
                # instead of letting the handler crash the connection
                try:
                    self.wfile.write(
                        b'event: error\ndata: '
                        b'{"detail": "engine connection lost"}\n\n')
                    self.wfile.flush()
                except OSError:
                    pass
            finally:
                resp.close()

        def _proxy(self):
            if self.path == "/gateway/health":
                payload = json.dumps(gateway.health()).encode()
                self._respond(200, {"Content-Type": "application/json"},
                              payload)
                return
            if self.command == "GET" and "/stream/" in self.path:
                return self._proxy_stream()
            length = int(self.headers.get("Content-Length") or 0)
            if length > 256 * 1024 * 1024:  # engine's own upload cap
                self._respond(413, {"Content-Type": "application/json"},
                              b'{"detail": "body too large"}')
                return
            body = self.rfile.read(length) if length else b""
            status, headers, payload = gateway.forward(
                self.command, self.path, body, dict(self.headers))
            self._respond(status, headers, payload)

        do_GET = do_POST = do_PUT = do_DELETE = do_PATCH = _proxy

    return Handler


def serve_gateway(engine_url: str, host: str = "0.0.0.0", port: int = 8080,
                  retry_window_s: float = 20.0,
                  ready_event: Optional[threading.Event] = None):
    gateway = Gateway(engine_url, retry_window_s=retry_window_s)
    server = ThreadingHTTPServer((host, port), make_handler(gateway))
    server.gateway = gateway
    print(f"gateway serving on {host}:{server.server_address[1]} "
          f"→ {engine_url}", flush=True)
    if ready_event is not None:
        ready_event.set()
    server.serve_forever()
    return server


def start_gateway_thread(engine_url: str, host: str = "127.0.0.1",
                         port: int = 0, retry_window_s: float = 20.0):
    """In-process gateway for tests → (server, thread)."""
    gateway = Gateway(engine_url, retry_window_s=retry_window_s)
    server = ThreadingHTTPServer((host, port), make_handler(gateway))
    server.gateway = gateway
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread

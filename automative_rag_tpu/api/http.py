"""Minimal stdlib HTTP framework (router + JSON + threading server).

The reference fronts everything with FastAPI; this environment ships no ASGI
stack, so the API layer is a small purpose-built framework on
``http.server``: pattern routes with ``{param}`` segments, JSON bodies,
x-token auth hook, and a threading server. The route *surface* matches the
reference (SURVEY.md §2.5); only the plumbing differs.
"""

from __future__ import annotations

import hmac
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional, Tuple
from urllib.parse import parse_qs, urlparse


class Request:
    def __init__(self, method: str, path: str, query: Dict[str, List[str]],
                 headers: Dict[str, str], body: bytes, params: Dict[str, str]):
        self.method = method
        self.path = path
        self.query = query
        self.headers = headers
        self.body = body
        self.params = params

    def json(self) -> Any:
        if not self.body:
            return {}
        return json.loads(self.body.decode("utf-8"))

    def query_param(self, name: str, default: Optional[str] = None) -> Optional[str]:
        values = self.query.get(name)
        return values[0] if values else default


class HTTPError(Exception):
    def __init__(self, status: int, detail):
        super().__init__(str(detail))
        self.status = status
        self.detail = detail


def parse_body(req: "Request", model_cls):
    """Validate the JSON body against a pydantic request model.

    Returns the validated model; raises HTTPError 422 with structured
    per-field errors on any mismatch (the reference gets this from
    FastAPI+pydantic for free — ~2000 L of contracts in src/models/;
    here the same contracts guard the stdlib router)."""
    from pydantic import ValidationError

    data = req.json()
    if not isinstance(data, dict):
        raise HTTPError(422, [{"field": "<root>", "error": "body must be a JSON object"}])
    try:
        return model_cls.model_validate(data)
    except ValidationError as exc:
        raise HTTPError(422, [
            {
                "field": ".".join(str(p) for p in e["loc"]) or "<root>",
                "error": e["msg"],
            }
            for e in exc.errors()
        ]) from exc


class StreamingResponse:
    """Incremental response: ``chunks`` is an iterator of str/bytes that
    the connection thread writes+flushes as they are produced (SSE and
    similar). No Content-Length — the stream ends by closing the
    connection, and a vanished client just closes the generator."""

    def __init__(self, chunks, content_type: str = "text/event-stream",
                 status: int = 200):
        self.chunks = chunks
        self.content_type = content_type
        self.status = status


class RawResponse:
    """Non-JSON handler result (HTML pages, files)."""

    def __init__(self, body, content_type: str = "text/html", status: int = 200):
        self.body = body.encode("utf-8") if isinstance(body, str) else body
        self.content_type = content_type
        self.status = status


Handler = Callable[[Request], Any]


def _compile(pattern: str) -> re.Pattern:
    regex = re.sub(r"\{(\w+)\}", r"(?P<\1>[^/]+)", pattern)
    return re.compile(f"^{regex}$")


class Router:
    def __init__(self):
        self._routes: List[Tuple[str, re.Pattern, str, Handler]] = []

    def add(self, method: str, pattern: str, handler: Handler) -> None:
        self._routes.append((method.upper(), _compile(pattern), pattern, handler))

    def get(self, pattern: str):
        return lambda fn: (self.add("GET", pattern, fn), fn)[1]

    def post(self, pattern: str):
        return lambda fn: (self.add("POST", pattern, fn), fn)[1]

    def delete(self, pattern: str):
        return lambda fn: (self.add("DELETE", pattern, fn), fn)[1]

    def match(self, method: str, path: str) -> Tuple[Optional[Handler], Dict[str, str], bool]:
        """→ (handler, params, path_exists)."""
        path_exists = False
        for route_method, regex, _pat, handler in self._routes:
            match = regex.match(path)
            if match:
                path_exists = True
                if route_method == method.upper():
                    return handler, match.groupdict(), True
        return None, {}, path_exists

    def routes(self) -> List[str]:
        return [f"{m} {p}" for m, _r, p, _h in self._routes]

    def describe(self) -> List[Dict[str, str]]:
        """Route metadata for docs: method, path, first doc line."""
        out = []
        for method, _regex, pattern, handler in self._routes:
            doc = (handler.__doc__ or "").strip().split("\n")[0]
            out.append({"method": method, "path": pattern, "summary": doc})
        return out


class HTTPApi:
    """Threading HTTP server over a Router with optional x-token auth."""

    def __init__(self, router: Router, auth_token: Optional[str] = None,
                 open_paths: Tuple[str, ...] = ("/health", "/auth/token")):
        self.router = router
        self.auth_token = auth_token
        self.open_paths = open_paths
        self._server: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # -------------------------------------------------------- dispatching
    def dispatch(self, method: str, path: str, headers: Dict[str, str],
                 body: bytes) -> Tuple[int, bytes, str]:
        # http.server decodes the request line as latin-1 (RFC-conservative),
        # so raw UTF-8 bytes in the URL (curl sends CJK unencoded) arrive
        # mojibake'd — e.g. ?manufacturer=奥迪 matches nothing. Re-decode;
        # a path that is already real unicode (tests call dispatch directly)
        # fails the latin-1 encode and is kept as-is. Percent-encoded input
        # is ASCII and unaffected either way.
        try:
            path = path.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            pass
        parsed = urlparse(path)
        handler, params, exists = self.router.match(method, parsed.path)

        if self.auth_token and parsed.path not in self.open_paths:
            token = headers.get("x-token") or headers.get("X-Token")
            auth = headers.get("authorization") or headers.get("Authorization") or ""
            if auth.startswith("Bearer "):
                token = token or auth[len("Bearer "):]
            if not (token and hmac.compare_digest(str(token), self.auth_token)):
                return 401, _dump({"detail": "invalid or missing x-token"}), "application/json"

        if handler is None:
            status = 405 if exists else 404
            return status, _dump({"detail": "not found" if status == 404 else "method not allowed"}), "application/json"

        request = Request(
            method=method,
            path=parsed.path,
            query=parse_qs(parsed.query),
            headers=headers,
            body=body,
            params=params,
        )
        try:
            result = handler(request)
        except HTTPError as exc:
            return exc.status, _dump({"detail": exc.detail}), "application/json"
        except (ValueError, KeyError, json.JSONDecodeError) as exc:
            return 400, _dump({"detail": f"{type(exc).__name__}: {exc}"}), "application/json"
        except Exception as exc:  # noqa: BLE001 — API boundary
            return 500, _dump({"detail": f"{type(exc).__name__}: {exc}"}), "application/json"

        if isinstance(result, StreamingResponse):
            return result
        if isinstance(result, RawResponse):
            return result.status, result.body, result.content_type
        if isinstance(result, tuple):
            status, payload = result
        else:
            status, payload = 200, result
        return status, _dump(payload), "application/json"

    # ------------------------------------------------------------ serving
    def serve(self, host: str = "0.0.0.0", port: int = 8000, background: bool = False):
        api = self

        MAX_BODY = 256 * 1024 * 1024  # PDF uploads cap

        class _Handler(BaseHTTPRequestHandler):
            def _run(self, method: str):
                length = int(self.headers.get("Content-Length") or 0)
                if length > MAX_BODY:
                    self.send_response(413)
                    self.end_headers()
                    return
                body = self.rfile.read(length) if length else b""
                result = api.dispatch(
                    method, self.path, dict(self.headers.items()), body
                )
                if isinstance(result, StreamingResponse):
                    return self._stream(result)
                status, payload, ctype = result
                self.send_response(status)
                self.send_header("Content-Type", ctype + "; charset=utf-8")
                self.send_header("Content-Length", str(len(payload)))
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                self.wfile.write(payload)

            def _stream(self, resp: StreamingResponse):
                self.send_response(resp.status)
                self.send_header(
                    "Content-Type", resp.content_type + "; charset=utf-8")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Connection", "close")
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                chunks = resp.chunks
                try:
                    for chunk in chunks:
                        if isinstance(chunk, str):
                            chunk = chunk.encode("utf-8")
                        self.wfile.write(chunk)
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client went away — close() below stops the source
                finally:
                    close = getattr(chunks, "close", None)
                    if close:
                        close()

            def do_GET(self):
                self._run("GET")

            def do_POST(self):
                self._run("POST")

            def do_DELETE(self):
                self._run("DELETE")

            def do_OPTIONS(self):
                self.send_response(204)
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header("Access-Control-Allow-Headers", "content-type,x-token,authorization")
                self.send_header("Access-Control-Allow-Methods", "GET,POST,DELETE,OPTIONS")
                self.end_headers()

            def log_message(self, fmt, *args):  # quiet
                pass

        self._server = ThreadingHTTPServer((host, port), _Handler)
        if background:
            self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
            self._thread.start()
            return self._server
        self._server.serve_forever()

    @property
    def port(self) -> Optional[int]:
        return self._server.server_address[1] if self._server else None

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()


def _dump(obj: Any) -> bytes:
    return json.dumps(obj, ensure_ascii=False, default=str).encode("utf-8")

"""API robustness fuzz: every route must answer garbage input with a
structured 4xx — never a 500 and never a handler crash. The reference gets
this from FastAPI+pydantic; here the stdlib router + schema validation must
provide the same guarantee, and this sweep pins it for EVERY registered
route (new endpoints are covered automatically)."""

import json

import pytest

from automative_rag_tpu.api.app import build_api
from automative_rag_tpu.app import RAGApplication

#: routes whose success path mutates heavyweight state we don't want to
#: trigger repeatedly with VALID-ish bodies — still fuzzed with garbage
_GARBAGE_BODIES = [
    b"",
    b"{",                      # malformed JSON
    b"[1, 2, 3]",              # non-object body
    b'{"unexpected": {"deep": [null]}}',
    b'"just a string"',
    b"\xff\xfe\x00garbage",    # invalid utf-8
]


@pytest.fixture(scope="module")
def api():
    app = RAGApplication(tiny=True, start_workers=False)
    yield build_api(app)
    app.shutdown()


def _routes(api):
    for method, _regex, pattern, _handler in api.router._routes:
        yield method, pattern


def test_every_route_survives_garbage(api):
    failures = []
    for method, pattern in _routes(api):
        path = pattern.replace("{job_id}", "zzz-no-such-job") \
                      .replace("{doc_id}", "zzz-no-such-doc") \
                      .replace("{mode}", "zzz") \
                      .replace("{context}", "zzz")
        if "stream" in path:
            continue  # SSE path returns a streaming handle, covered below
        for body in _GARBAGE_BODIES:
            result = api.dispatch(
                method, path, {"content-type": "application/json"}, body)
            status, payload, ctype = result
            if status >= 500:
                failures.append((method, path, body[:20], status,
                                 payload[:120]))
                continue
            if ctype.startswith("application/json"):
                json.loads(payload)  # error bodies stay structured
    assert not failures, failures


def test_query_param_garbage(api):
    """Malformed query params (non-numeric limits/offsets/years) must be
    4xx, not 500."""
    for path in (
        "/ingest/documents?year=banana",
        "/ingest/documents?year_gte=x&year_lte=y",
        "/ingest/documents?limit=NaN",
        "/ingest/jobs?limit=--1&offset=huge",
        "/query/history?limit=banana",
    ):
        status, payload, _ = api.dispatch("GET", path, {}, b"")
        assert 400 <= status < 500, (path, status, payload[:200])
        json.loads(payload)


def test_stream_route_unknown_job(api):
    result = api.dispatch("GET", "/query/stream/zzz-unknown", {}, b"")
    status = result[0] if isinstance(result, tuple) else result.status
    assert status == 404

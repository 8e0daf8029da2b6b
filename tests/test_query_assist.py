"""Query-assist layer: template catalog, quality analysis, contextual
help — the server-side ports of the reference's UI-embedded helpers
(src/ui/components/query_templates.py, query_refinement.py,
contextual_help.py), plus their API endpoints."""

import json

import pytest

from automative_rag_tpu.api.app import build_api
from automative_rag_tpu.app import RAGApplication
from automative_rag_tpu.schemas.enums import QueryMode
from automative_rag_tpu.services.query_assist import (
    CONTEXTUAL_HELP,
    QUERY_TEMPLATES,
    analyze_query_quality,
)


# ------------------------------------------------------------- pure layer

def test_templates_cover_every_mode():
    modes = {t["suggested_mode"] for t in QUERY_TEMPLATES}
    assert modes == {m.value for m in QueryMode}
    for t in QUERY_TEMPLATES:
        assert t["template"] and t["examples"] and t["icon"]


def test_analyze_specific_query_scores_high():
    a = analyze_query_quality("2023年宝马X5的百公里加速是多少？")
    assert a["quality_score"] >= 0.8
    assert "包含具体年份" in a["strengths"]
    assert "包含具体品牌" in a["strengths"]
    assert a["detected"]["year"] == 2023
    assert a["detected"]["manufacturer"] == "宝马"


def test_analyze_model_implies_manufacturer():
    a = analyze_query_quality("Model 3的续航多少")
    assert a["detected"].get("model") == "Model 3"
    assert a["detected"].get("manufacturer") == "特斯拉"


def test_analyze_broad_query_gets_suggestions():
    a = analyze_query_quality("所有汽车哪个好")
    assert "too_broad" in a["issues"]
    assert a["suggestions"]
    assert a["quality_score"] < 0.7


def test_analyze_short_and_vague():
    a = analyze_query_quality("它好吗")
    assert "too_short" in a["issues"] or "missing_context" in a["issues"]
    assert a["quality_score"] <= 0.5


def test_analyze_clamps_score():
    a = analyze_query_quality("")
    assert 0.0 <= a["quality_score"] <= 1.0


def test_help_covers_every_ui_view():
    assert set(CONTEXTUAL_HELP) == {"query", "ingest", "browse", "jobs", "system"}
    for h in CONTEXTUAL_HELP.values():
        assert h["title"] and h["body"] and h["tip"]


# ------------------------------------------------------------- API layer

@pytest.fixture(scope="module")
def call():
    app = RAGApplication(tiny=True)
    api = build_api(app)

    def _call(method, path, body=None):
        raw = json.dumps(body, ensure_ascii=False).encode() if body is not None else b""
        status, payload, _ = api.dispatch(method, path, {}, raw)
        return status, json.loads(payload)

    yield _call
    app.shutdown()


def test_templates_endpoint(call):
    status, out = call("GET", "/query/templates")
    assert status == 200
    assert len(out["templates"]) == len(QUERY_TEMPLATES)
    assert out["templates"][0]["suggested_mode"]


def test_analyze_endpoint(call):
    status, out = call("POST", "/query/analyze",
                       {"query": "2023年宝马X5的后备箱容积"})
    assert status == 200
    assert out["quality_score"] >= 0.8
    assert out["detected"]["manufacturer"] == "宝马"


def test_analyze_endpoint_rejects_empty(call):
    status, out = call("POST", "/query/analyze", {"query": ""})
    assert status == 422
    status, out = call("POST", "/query/analyze", {})
    assert status == 422


def test_help_endpoint(call):
    status, out = call("GET", "/system/help/query")
    assert status == 200 and out["title"]
    status, _ = call("GET", "/system/help/nonsense")
    assert status == 404


# -------------------------------------------------- shared entity matcher

def test_entity_matcher_boundaries():
    """Review findings: G6 must not match inside G63; 唐 must not match
    inside 唐山; English brand names match case-insensitively."""
    from automative_rag_tpu.ingestion.metadata import find_query_entities

    assert find_query_entities("奔驰G63的越野能力怎么样").get("model") != "G6"
    assert find_query_entities("奔驰G63的越野能力怎么样")["manufacturer"] == "奔驰"
    assert "model" not in find_query_entities("唐山附近哪里有充电站")
    assert find_query_entities("唐的最高时速是多少")["model"] == "唐"
    assert find_query_entities("汉的续航里程是多少？")["model"] == "汉"
    a = analyze_query_quality("Tesla的自动驾驶安全吗")
    assert a["detected"].get("manufacturer") == "特斯拉"
    b = analyze_query_quality("BMW X5怎么样")
    assert b["detected"].get("manufacturer") == "宝马"

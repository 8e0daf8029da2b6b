"""Query-assist services: templates, quality analysis, contextual help.

Server-side ports of the reference's Streamlit-embedded helpers
(src/ui/components/query_templates.py, query_refinement.py,
contextual_help.py) so they are UI-agnostic and testable: the web UI and
any API consumer get the same catalogs and the same analyzer. Unlike the
reference's hardcoded 8-brand list, the analyzer recognizes every brand
and model the ingestion metadata extractor knows
(ingestion/metadata.py), so its notion of "specific" stays in sync with
what the index can actually filter on.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

from ..ingestion.metadata import find_query_entities

# ---------------------------------------------------------------------------
# Query templates (reference query_templates.py:7-60)
# ---------------------------------------------------------------------------

QUERY_TEMPLATES: List[Dict[str, Any]] = [
    {
        "category": "车型对比",
        "icon": "⚖️",
        "template": "{车型A} 与 {车型B} 的 {对比方面} 对比分析",
        "suggested_mode": "tradeoffs",
        "examples": [
            "宝马X5与奔驰GLE的安全配置对比分析",
            "特斯拉Model 3与比亚迪汉的充电便利性对比分析",
        ],
    },
    {
        "category": "功能评估",
        "icon": "🎯",
        "template": "是否应该选择带有{功能名称}的{车型}？",
        "suggested_mode": "features",
        "examples": [
            "是否应该选择带有自动驾驶功能的特斯拉？",
            "是否应该选择带有空气悬挂的奔驰S级？",
        ],
    },
    {
        "category": "使用场景",
        "icon": "🎭",
        "template": "{车型}在{使用场景}下的表现如何？",
        "suggested_mode": "scenarios",
        "examples": [
            "宝马iX3在长途高速驾驶下的表现如何？",
            "丰田汉兰达在城市拥堵路况下的表现如何？",
        ],
    },
    {
        "category": "规格查询",
        "icon": "📏",
        "template": "{年份}年{车型}的{具体参数}是多少？",
        "suggested_mode": "facts",
        "examples": [
            "2023年奔驰E级的后备箱容积是多少？",
            "2024年宝马3系的百公里加速时间是多少？",
        ],
    },
    {
        "category": "多方观点",
        "icon": "🗣️",
        "template": "关于{车型}的{争议话题}，各方怎么看？",
        "suggested_mode": "debate",
        "examples": [
            "关于增程式电动车的技术路线，各方怎么看？",
            "关于特斯拉单踏板模式的安全性，各方怎么看？",
        ],
    },
    {
        "category": "用户评价",
        "icon": "💬",
        "template": "车主对{车型}的{方面}有什么评价？",
        "suggested_mode": "quotes",
        "examples": [
            "车主对理想L9的空间表现有什么评价？",
            "车主对小鹏G6的智能驾驶有什么评价？",
        ],
    },
]

# ---------------------------------------------------------------------------
# Query quality analysis (reference query_refinement.py:39-72)
# ---------------------------------------------------------------------------

_YEAR_RE = re.compile(r"(?:19[89]\d|20[0-4]\d)\s*年?款?")

_ISSUE_PATTERNS: Dict[str, Dict[str, Any]] = {
    "too_broad": {
        "indicators": ("汽车", "车辆", "所有", "全部", "任何", "哪些车", "什么车"),
        "suggestions": [
            "尝试指定具体的车型和年份",
            "添加品牌名称会获得更精确的结果",
            "考虑限制到特定的车辆类别",
        ],
    },
    "missing_context": {
        "indicators": ("这个", "那个", "它的", "该车"),
        "suggestions": [
            "请明确指出具体的车型或功能",
            "添加更多背景信息",
            "指定您关心的具体方面",
        ],
    },
    "too_technical": {
        "indicators": ("ECU", "CAN总线", "OBD", "涡轮增压器标定", "域控制器"),
        "suggestions": [
            "考虑使用更通用的术语",
            "添加功能描述而非技术名称",
            "说明您想了解的具体用途",
        ],
    },
}


def analyze_query_quality(query: str) -> Dict[str, Any]:
    """Score a query's specificity and suggest refinements.

    Returns ``{quality_score, strengths, issues, suggestions, detected}``
    where ``detected`` carries the manufacturer/model/year actually
    recognized (reusable as a pre-filled metadata filter by the UI).
    """
    query = query or ""
    score = 0.5
    strengths: List[str] = []
    issues: List[str] = []
    suggestions: List[str] = []
    detected: Dict[str, Any] = {}

    year_match = _YEAR_RE.search(query)
    if year_match:
        score += 0.2
        strengths.append("包含具体年份")
        detected["year"] = int(re.search(r"\d{4}", year_match.group()).group())

    # shared boundary-aware matcher — same detection as the retrieval
    # engine's entity expansion, case-insensitive
    entities = find_query_entities(query)
    if "manufacturer" in entities:
        score += 0.2
        strengths.append("包含具体品牌")
        detected["manufacturer"] = entities["manufacturer"]
    if "model" in entities:
        score += 0.1
        strengths.append("包含具体车型")
        detected["model"] = entities["model"]

    for issue, spec in _ISSUE_PATTERNS.items():
        if any(ind.lower() in query.lower() for ind in spec["indicators"]):
            issues.append(issue)
            suggestions.extend(spec["suggestions"])
            score -= 0.1

    if len(query.strip()) < 6:
        issues.append("too_short")
        suggestions.append("问题太短，补充车型/年份/想了解的方面")
        score -= 0.1

    return {
        "quality_score": round(max(0.0, min(1.0, score)), 2),
        "strengths": strengths,
        "issues": issues,
        "suggestions": suggestions[:3],
        "detected": detected,
    }


# ---------------------------------------------------------------------------
# Contextual help (reference contextual_help.py:7-79)
# ---------------------------------------------------------------------------

CONTEXTUAL_HELP: Dict[str, Dict[str, str]] = {
    "query": {
        "title": "智能查询",
        "body": "选择与问题类型匹配的模式：事实查询最快；对比/场景/评价模式检索更深、"
                "生成更长。筛选条件将检索限制在指定品牌/车型/年款内。",
        "tip": "问题里写明年份和具体车型，检索命中率显著更高。",
    },
    "ingest": {
        "title": "数据摄取",
        "body": "文本/PDF/视频都会经过：元数据提取 → 分块(1000/200) → 向量编码 → "
                "索引。视频走 下载 → 转写 → 清洗 → 编码 链。",
        "tip": "批量视频一行一个 URL；每个视频是独立任务，单个失败不影响其它。",
    },
    "browse": {
        "title": "文档浏览",
        "body": "按元数据翻页浏览索引内容，或切到相关度检索看某个查询会召回什么。"
                "点开块详情可看同源块和词元级匹配解释。",
        "tip": "相关度模式下点击结果可以看到 ColBERT 词元匹配的逐词解释。",
    },
    "jobs": {
        "title": "后台任务",
        "body": "每个任务是一条可观察的执行链（步骤、耗时、进度流、验证摘要）。"
                "失败步骤自动重试并指数退避；停滞任务会被守护进程标记超时。",
        "tip": "开启自动刷新可以实时跟踪长任务（如视频转写）。",
    },
    "system": {
        "title": "系统信息",
        "body": "工作线程心跳、队列积压、索引统计（HBM 占用/量化精度/分片）、"
                "模型状态与运行时配置都在这里。",
        "tip": "更改模型配置后用 预热 按钮触发重新编译，避免首个查询变慢。",
    },
}

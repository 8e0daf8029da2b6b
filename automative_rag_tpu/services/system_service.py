"""System-level business logic: mode catalog, capabilities, enumeration,
debug retrieval with quality analysis, performance metrics.

Parity target: reference ``SystemService`` (``src/services/system_service.py``)
— query-mode catalog with Chinese names/icons (:26-117), capabilities
(:127-218), manufacturer/model enumeration from the index with fallback
lists (:220-263), queue status (:265-330), debug retrieval with quality
analysis + recommendations (:332-560), perf metrics (:571-616).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

from ..config.mode_config import QueryMode, mode_config
from ..ingestion.metadata import known_manufacturers, known_models

MODE_CATALOG = {
    QueryMode.FACTS: {"name": "车辆规格查询", "icon": "📌", "description": "查询具体车辆参数与规格"},
    QueryMode.FEATURES: {"name": "功能特性分析", "icon": "💡", "description": "分析配置与功能亮点"},
    QueryMode.TRADEOFFS: {"name": "权衡利弊分析", "icon": "🧾", "description": "对比优缺点"},
    QueryMode.SCENARIOS: {"name": "使用场景评估", "icon": "🧩", "description": "评估特定使用场景的适配性"},
    QueryMode.DEBATE: {"name": "多角度辩论", "icon": "🗣️", "description": "多个视角的观点碰撞"},
    QueryMode.QUOTES: {"name": "原文引用提取", "icon": "💬", "description": "提取来源原文引述"},
}


class SystemService:
    def __init__(self, app):
        self.app = app  # RAGApplication

    # ------------------------------------------------------------- modes
    def get_query_modes(self) -> List[Dict[str, Any]]:
        out = []
        for mode, info in MODE_CATALOG.items():
            params = mode_config.params(mode)
            out.append(
                {
                    "mode": mode.value,
                    **info,
                    "retrieval_k": params.retrieval_k,
                    "final_k": params.final_k,
                    "complexity": params.complexity,
                }
            )
        return out

    def get_capabilities(self) -> Dict[str, Any]:
        return {
            "query_modes": [m.value for m in MODE_CATALOG],
            "ingestion_sources": ["text", "pdf", "video"],
            "metadata_filters": [
                "manufacturer", "model", "year", "category",
                "engine_type", "transmission", "source", "source_id",
            ],
            "late_interaction_rerank": True,
            "validation_pipeline": True,
            "index": self.app.index.stats(),
            "languages": ["zh", "en"],
        }

    # ------------------------------------------------------- enumeration
    def get_manufacturers(self) -> List[str]:
        indexed = sorted(self.app.index.columns.vocabs.get("manufacturer", {}))
        return indexed or known_manufacturers()

    def get_models(self, manufacturer: Optional[str] = None) -> List[str]:
        indexed = sorted(self.app.index.columns.vocabs.get("model", {}))
        return indexed or known_models(manufacturer)

    # ----------------------------------------------------- debug retrieval
    def debug_retrieval(
        self,
        query: str,
        mode: QueryMode | str = QueryMode.FACTS,
        metadata_filter: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        """Retrieval inspection with quality analysis + recommendations
        (reference :332-560)."""
        ranked = self.app.engine.retrieve(query, mode=mode, metadata_filter=metadata_filter)
        scores = [s for _, s in ranked]
        analysis: Dict[str, Any] = {
            "count": len(ranked),
            "score_range": [min(scores), max(scores)] if scores else None,
            "avg_score": sum(scores) / len(scores) if scores else None,
            "timings": self.app.engine.last_timings,
        }
        recommendations = []
        if not ranked:
            recommendations.append("no documents matched — ingest more content or relax filters")
        elif analysis["avg_score"] is not None and analysis["avg_score"] < 0.4:
            recommendations.append("low relevance — consider rephrasing the query")
        if metadata_filter and len(ranked) < 3:
            recommendations.append("filter is very selective — try removing a condition")
        return {
            "query": query,
            "analysis": analysis,
            "recommendations": recommendations,
            "documents": [
                {"id": d.id, "score": s, "metadata": d.metadata, "preview": d.page_content[:160]}
                for d, s in ranked
            ],
        }

    # ---------------------------------------------------------- metrics
    def performance_metrics(self) -> Dict[str, Any]:
        queues = self.app.queue_manager.get_queue_status()
        jobs = self.app.tracker.get_job_counts()
        total_done = sum(q["completed"] for q in queues.values())
        total_failed = sum(q["failed"] for q in queues.values())
        return {
            "uptime_s": round(time.time() - self.app.started_at, 1),
            "tasks_completed": total_done,
            "tasks_failed": total_failed,
            "task_success_rate": (
                total_done / (total_done + total_failed) if total_done + total_failed else 1.0
            ),
            "jobs": jobs,
            "index_documents": self.app.index.count,
            "last_retrieval_timings": self.app.engine.last_timings,
        }

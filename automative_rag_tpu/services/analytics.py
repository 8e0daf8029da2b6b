"""Query history + usage analytics + suggestions.

Parity target: the reference UI components ``query_history`` (105 LoC),
``usage_analytics``, ``smart_suggestions``, ``result_quality`` (SURVEY.md
§2.7) — rebuilt as a service so both the API and the web UI consume the same
data instead of Streamlit session state.
"""

from __future__ import annotations

import threading
import time
from collections import Counter, deque
from typing import Any, Dict, List, Optional

from ..ingestion.metadata import known_manufacturers, known_models
from ..utils.quality import extract_key_terms


class AnalyticsService:
    def __init__(self, max_events: int = 1000):
        self._events: deque = deque(maxlen=max_events)
        self._lock = threading.Lock()

    # ------------------------------------------------------------ record
    def record_query(
        self,
        query: str,
        mode: str,
        latency_s: float,
        confidence: Optional[float] = None,
        n_sources: int = 0,
        job_id: Optional[str] = None,
    ) -> None:
        with self._lock:
            self._events.append(
                {
                    "time": time.time(),
                    "query": query,
                    "mode": mode,
                    "latency_s": round(latency_s, 4),
                    "confidence": confidence,
                    "n_sources": n_sources,
                    "job_id": job_id,
                }
            )

    # ------------------------------------------------------------- reads
    def history(self, limit: int = 50) -> List[Dict[str, Any]]:
        with self._lock:
            return list(self._events)[-limit:][::-1]

    def usage_summary(self) -> Dict[str, Any]:
        with self._lock:
            events = list(self._events)
        if not events:
            return {"total_queries": 0}
        modes = Counter(e["mode"] for e in events)
        latencies = sorted(e["latency_s"] for e in events)
        confidences = [e["confidence"] for e in events if e["confidence"] is not None]
        terms = Counter()
        for e in events:
            terms.update(extract_key_terms(e["query"]))
        return {
            "total_queries": len(events),
            "by_mode": dict(modes),
            "top_mode": modes.most_common(1)[0][0],
            "avg_latency_s": round(sum(latencies) / len(latencies), 4),
            "latency_p50_s": latencies[len(latencies) // 2],
            "latency_p95_s": latencies[int(len(latencies) * 0.95) - 1],
            "avg_confidence": (
                round(sum(confidences) / len(confidences), 1) if confidences else None
            ),
            "zero_source_rate": sum(1 for e in events if e["n_sources"] == 0) / len(events),
            "top_terms": terms.most_common(10),
        }

    def suggestions(self, prefix: str = "", limit: int = 8) -> List[str]:
        """Query suggestions: recent history first, then known models."""
        prefix = prefix.strip().lower()
        seen, out = set(), []
        with self._lock:
            recents = [e["query"] for e in reversed(self._events)]
        for candidate in recents + [f"{m}怎么样" for m in known_models()] + [
            f"{m}的车型推荐" for m in known_manufacturers()
        ]:
            if prefix and prefix not in candidate.lower():
                continue
            if candidate in seen:
                continue
            seen.add(candidate)
            out.append(candidate)
            if len(out) >= limit:
                break
        return out

"""Causal-analysis service (roadmap stub).

Parity target: reference ``CausationService`` (``src/services/
causation_service.py:27-300``) — an explicitly future capability whose
methods return roadmap/"not implemented" structures; kept so API consumers
see the same surface.
"""

from __future__ import annotations

from typing import Any, Dict


class CausationService:
    ROADMAP = [
        "causal graph construction from spec/complaint corpora",
        "counterfactual queries over vehicle configurations",
        "root-cause chains for reported issues",
    ]

    def analyze(self, query: str) -> Dict[str, Any]:
        return {
            "implemented": False,
            "query": query,
            "message": "causal analysis is a roadmap capability",
            "roadmap": self.ROADMAP,
        }

    def capabilities(self) -> Dict[str, Any]:
        return {"implemented": False, "roadmap": self.ROADMAP}

"""Continuous-batching LLM serving (slot pool + jitted decode bursts)."""

from .engine import Request, ServingEngine

__all__ = ["Request", "ServingEngine"]

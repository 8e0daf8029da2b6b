from .reranker import LateInteractionReranker

__all__ = ["LateInteractionReranker"]

from .topk import masked_top_k, merge_top_k

__all__ = ["masked_top_k", "merge_top_k"]

from .filters import MetadataColumns, FilterSpec, compile_filter, eval_filter_mask
from .flat import FlatIndex, SearchResult

__all__ = [
    "MetadataColumns",
    "FilterSpec",
    "compile_filter",
    "eval_filter_mask",
    "FlatIndex",
    "SearchResult",
]

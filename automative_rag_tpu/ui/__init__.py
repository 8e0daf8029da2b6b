from .page import UI_HTML

__all__ = ["UI_HTML"]

from .engine import ValidationEngine

__all__ = ["ValidationEngine"]

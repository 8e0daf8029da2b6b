from .http import HTTPApi, Request, Router
from .app import build_api, serve

__all__ = ["HTTPApi", "Request", "Router", "build_api", "serve"]

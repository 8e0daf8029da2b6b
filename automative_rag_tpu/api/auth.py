"""Token auth: HMAC-signed bearer tokens + an in-memory user table.

Parity target: reference ``src/api/auth.py`` (OAuth2 password flow issuing a
JWT signed with the api key, mock in-memory user db) — implemented on stdlib
``hmac`` (no jose/jwt library in the image): token = base64(payload).sig
with an expiry claim.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
from typing import Any, Dict, Optional

# mock user db (reference keeps a mock in-memory table too)
USERS = {"admin": hashlib.sha256(b"admin-password").hexdigest()}

TOKEN_TTL_S = 30 * 60


def _sign(payload_b64: bytes, secret: str) -> str:
    return hmac.new(secret.encode(), payload_b64, hashlib.sha256).hexdigest()


def issue_token(username: str, password: str, secret: str) -> Optional[str]:
    want = USERS.get(username)
    if want is None or hashlib.sha256(password.encode()).hexdigest() != want:
        return None
    payload = {"sub": username, "exp": time.time() + TOKEN_TTL_S}
    payload_b64 = base64.urlsafe_b64encode(json.dumps(payload).encode())
    return f"{payload_b64.decode()}.{_sign(payload_b64, secret)}"


def verify_token(token: str, secret: str) -> Optional[Dict[str, Any]]:
    try:
        payload_b64, signature = token.rsplit(".", 1)
    except ValueError:
        return None
    if not hmac.compare_digest(_sign(payload_b64.encode(), secret), signature):
        return None
    try:
        payload = json.loads(base64.urlsafe_b64decode(payload_b64))
    except (ValueError, json.JSONDecodeError):
        return None
    if payload.get("exp", 0) < time.time():
        return None
    return payload

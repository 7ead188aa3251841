"""HTTP API gateway — the ingestion front door (SURVEY O7, D13/O14).

Reference parity: libsoup server on :8088 with a root handler that
currently answers 202 Accepted to everything (/root/reference/src/
main.c:82-120); the declared intent (struct members) is parse → authn
(JWT) → publish to a topic.  This shim implements that intent:

  POST /topics/<broker>/<topic>   body: one JSON event or a JSON array
      → agency.publish into the topic log → 202 {"accepted": n}
  GET  /health                    → 200 {"status": "ok", "topics": [...]}

Auth: optional HS256 bearer JWT (functions/auth.py) — when a secret is
configured, requests without a valid token get 401 (the reference links
libjwt for exactly this boundary).

Design: the gateway is a thin stdlib ThreadingHTTPServer — deliberately
NOT part of the data plane.  It appends to the durable topic log and
returns; all analytics happen in Spark consumers.  At scale this role is
played by a fleet of stateless ingest pods in front of Kafka — the
engine-side contract (publish → log → consume) is identical.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from event_streaming_spark.functions.auth import parse_rsa_pem, verify_hs256, verify_rs256
from event_streaming_spark.streaming.agency import EventsAgency


class ApiGateway:
    #: Reject request bodies above this size with 413 — an unauthenticated
    #: client must not be able to buffer arbitrary bytes into gateway memory.
    MAX_BODY_BYTES = 4 * 1024 * 1024

    def __init__(
        self,
        agency: EventsAgency,
        host: str = "127.0.0.1",
        port: int = 8088,
        jwt_secret: str | None = None,
        jwt_rs256_public_key: str | dict | None = None,
        allowed_topics: set[tuple[str, str]] | None = None,
        auto_create_topics: bool = True,
    ) -> None:
        """``allowed_topics``: optional allowlist of (broker, topic) pairs
        POST may target.  ``auto_create_topics=False`` restricts POST to
        topics that already exist — otherwise any client could create
        unbounded topic directories on disk.  Auth accepts HS256 bearer
        tokens when ``jwt_secret`` is set and RS256 when
        ``jwt_rs256_public_key`` (PEM or int dict) is set — either one
        valid token admits the request (the reference's libjwt boundary
        is RS256: tests/test-jwt.c:134-209)."""
        self.agency = agency
        self.jwt_secret = jwt_secret
        if isinstance(jwt_rs256_public_key, str):
            jwt_rs256_public_key = parse_rsa_pem(jwt_rs256_public_key)
        self.jwt_rs256_public_key = jwt_rs256_public_key
        self.allowed_topics = allowed_topics
        self.auto_create_topics = auto_create_topics
        gateway = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authed(self) -> bool:
                if gateway.jwt_secret is None and gateway.jwt_rs256_public_key is None:
                    return True
                hdr = self.headers.get("Authorization", "")
                # auth-scheme is case-insensitive (RFC 7235 §2.1)
                if not hdr[:7].lower() == "bearer ":
                    return False
                token = hdr[7:]
                # `is not None`, never truthiness: a validly-signed token
                # with EMPTY claims returns {} (falsy) — r6 review
                if gateway.jwt_secret is not None and (
                    verify_hs256(token, gateway.jwt_secret) is not None
                ):
                    return True
                return (
                    gateway.jwt_rs256_public_key is not None
                    and verify_rs256(token, gateway.jwt_rs256_public_key) is not None
                )

            def do_GET(self):  # noqa: N802
                if self.path == "/health":
                    # liveness is unauthenticated; the TOPIC REGISTRY is
                    # not (it enumerates tenant structure — r6 review)
                    body = {"status": "ok"}
                    if self._authed():
                        body["topics"] = [list(t) for t in gateway.agency.topics()]
                    self._reply(200, body)
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):  # noqa: N802
                if not self._authed():
                    self._reply(401, {"error": "invalid or missing bearer token"})
                    return
                parts = [p for p in self.path.split("/") if p]
                if len(parts) != 3 or parts[0] != "topics":
                    self._reply(404, {"error": "POST /topics/<broker>/<topic>"})
                    return
                _, broker, topic = parts
                if gateway.allowed_topics is not None and (broker, topic) not in gateway.allowed_topics:
                    self._reply(403, {"error": "topic not allowed"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    self._reply(400, {"error": "bad Content-Length"})
                    return
                if n < 0:
                    # rfile.read(-1) would block until EOF, pinning the
                    # handler thread forever (r6 review)
                    self._reply(400, {"error": "bad Content-Length"})
                    return
                if n > gateway.MAX_BODY_BYTES:
                    self._reply(413, {"error": f"body exceeds {gateway.MAX_BODY_BYTES} bytes"})
                    return
                if not gateway.auto_create_topics and (broker, topic) not in set(
                    gateway.agency.topics()
                ):
                    self._reply(404, {"error": "unknown topic (auto-create disabled)"})
                    return
                try:
                    payload = json.loads(self.rfile.read(n) or b"null")
                except (ValueError, json.JSONDecodeError):
                    self._reply(400, {"error": "body must be JSON"})
                    return
                if isinstance(payload, dict):
                    events = [payload]
                elif isinstance(payload, list) and all(isinstance(e, dict) for e in payload):
                    events = payload
                else:
                    self._reply(400, {"error": "body must be a JSON object or array of objects"})
                    return
                ctx = gateway.agency.topic(broker, topic)
                try:
                    ctx.publish(events)
                except Exception as e:
                    # client-controlled payloads that fail schema coercion
                    # must produce a response, not a dropped connection
                    self._reply(400, {"error": f"events rejected: {type(e).__name__}"})
                    return
                # 202 Accepted — the reference handler's status, now earned
                self._reply(202, {"accepted": len(events), "broker": broker, "topic": topic})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address[:2]

    def start(self) -> "ApiGateway":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._thread is not None:
            # shutdown() waits on an event only serve_forever() sets —
            # calling it before start() would deadlock (r6 review)
            self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)

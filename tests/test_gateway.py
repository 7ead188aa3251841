"""API gateway: HTTP ingest → topic log → Spark consumption, with JWT auth."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from event_streaming_spark.functions.auth import mint_hs256
from event_streaming_spark.streaming.agency import EventsAgency
from event_streaming_spark.streaming.gateway import ApiGateway


@pytest.fixture()
def gw(spark, tmp_path):
    agency = EventsAgency(spark, root=str(tmp_path / "agency"))
    g = ApiGateway(agency, port=0, jwt_secret="gw-secret").start()  # port 0 = ephemeral
    yield g
    g.stop()
    agency.close()


def _post(gw, path, body, token=None):
    host, port = gw.address
    req = urllib.request.Request(
        f"http://{host}:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}
        | ({"Authorization": f"Bearer {token}"} if token else {}),
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_ingest_roundtrip_through_spark(gw, spark):
    tok = mint_hs256({"iss": "event-streaming", "sub": "tester"}, "gw-secret")
    ev = {
        "event_id": 101, "ts": "2024-02-01T10:00:00", "user_id": 3,
        "event_type": "click", "value": 1.5, "props": '{"k": 9}',
    }
    code, body = _post(gw, "/topics/b1/ingest", ev, token=tok)
    assert (code, body["accepted"]) == (202, 1)
    code, body = _post(gw, "/topics/b1/ingest", [ev | {"event_id": 102}, ev | {"event_id": 103}], token=tok)
    assert (code, body["accepted"]) == (202, 2)

    got = []
    ctx = gw.agency.find_topic("b1", "ingest")
    ctx.consume(lambda c, df, i: got.extend(df.collect()), once=True)
    assert sorted(r["event_id"] for r in got) == [101, 102, 103]
    assert all(r["value"] == 1.5 for r in got)


def test_auth_and_error_paths(gw):
    ev = {"event_id": 1}
    assert _post(gw, "/topics/b/t", ev)[0] == 401               # no token
    assert _post(gw, "/topics/b/t", ev, token="garbage")[0] == 401
    tok = mint_hs256({"sub": "x"}, "wrong-secret")
    assert _post(gw, "/topics/b/t", ev, token=tok)[0] == 401    # wrong key
    tok = mint_hs256({"sub": "x"}, "gw-secret")
    assert _post(gw, "/topics/b/t", ev, token=tok)[0] == 202
    assert _post(gw, "/nope", ev, token=tok)[0] == 404
    assert _post(gw, "/topics/b/t", "not-an-event", token=tok)[0] == 400

    # health endpoint: liveness is open, but the topic registry is
    # auth-gated (r6: unauthenticated enumeration disclosure)
    host, port = gw.address
    with urllib.request.urlopen(f"http://{host}:{port}/health") as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert "topics" not in health
    req = urllib.request.Request(
        f"http://{host}:{port}/health", headers={"Authorization": f"Bearer {tok}"}
    )
    with urllib.request.urlopen(req) as r:
        health = json.loads(r.read())
    assert ["b", "t"] in health["topics"]


def test_gateway_body_cap_and_topic_restrictions(spark, tmp_path, monkeypatch):
    agency = EventsAgency(spark, root=str(tmp_path / "agency2"))
    g = ApiGateway(
        agency,
        port=0,
        allowed_topics={("b", "ok")},
        auto_create_topics=False,
    ).start()
    try:
        ev = {"event_id": 1, "ts": "2024-02-01T10:00:00", "user_id": 1,
              "event_type": "click", "value": 1.0, "props": "{}"}
        # allowlist: anything else is 403, even unauthenticated
        assert _post(g, "/topics/b/other", ev)[0] == 403
        # allowed but nonexistent with auto-create off → 404, no dir created
        assert _post(g, "/topics/b/ok", ev)[0] == 404
        assert agency.find_topic("b", "ok") is None
        # pre-created topic works
        agency.topic("b", "ok")
        assert _post(g, "/topics/b/ok", ev)[0] == 202
        # oversized body → 413 before any read
        monkeypatch.setattr(ApiGateway, "MAX_BODY_BYTES", 64)
        big = ev | {"props": "x" * 200}
        assert _post(g, "/topics/b/ok", big)[0] == 413
    finally:
        g.stop()
        agency.close()


def test_gateway_ingest_roundtrip_query(spark, duck):
    """The registered driver-gate query: HTTP ingest of the sf0.001
    events table must reproduce the raw-parquet daily rollup exactly
    (differential vs DuckDB, mirroring tools/check_oracle.py)."""
    from event_streaming_spark.plans.catalog import REGISTRY
    from tests.conftest import SF_SMALL

    q = REGISTRY["gateway_ingest_roundtrip"]
    got = q.fn(spark, SF_SMALL).collect()
    want = duck.sql(q.oracle).fetchall()
    assert len(got) == len(want)
    got_rows = sorted(
        (str(r["event_date"]), r["event_type"], r["n_events"], r["n_users"],
         round(r["total_value"], 2))
        for r in got
    )
    want_rows = sorted(
        (str(d), et, n, nu, round(tv, 2)) for d, et, n, nu, tv in want
    )
    assert got_rows == want_rows


def test_gateway_hardening_r6(spark, tmp_path):
    """r6 review fixes: negative Content-Length -> 400 (not a pinned
    thread), malformed event payloads -> 400 (not a dropped connection),
    empty-claims HS256 tokens authenticate, bearer scheme is
    case-insensitive, /health hides the topic registry from
    unauthenticated callers, stop() before start() doesn't deadlock."""
    import http.client
    import json as _json

    from event_streaming_spark.functions.auth import mint_hs256
    from event_streaming_spark.streaming.agency import EventsAgency
    from event_streaming_spark.streaming.gateway import ApiGateway

    agency = EventsAgency(spark, root=str(tmp_path / "gwa"), log_format="parquet")
    # stop() before start(): must not hang
    ApiGateway(agency, port=0, jwt_secret="s").stop()

    gw = ApiGateway(agency, port=0, jwt_secret="s").start()
    try:
        host, port = gw.address
        empty_tok = mint_hs256({}, "s")  # validly signed, FALSY claims

        def req(method, path, body=None, headers=None, raw_len=None):
            c = http.client.HTTPConnection(host, port, timeout=10)
            hs = dict(headers or {})
            data = None if body is None else _json.dumps(body)
            if raw_len is not None:
                c.putrequest(method, path)
                for k, v in hs.items():
                    c.putheader(k, v)
                c.putheader("Content-Length", str(raw_len))
                c.endheaders()
            else:
                c.request(method, path, data, hs)
            r = c.getresponse()
            out = (r.status, _json.loads(r.read() or b"{}"))
            c.close()
            return out

        auth = {"Authorization": f"Bearer {empty_tok}"}
        # empty-claims token authenticates (is-not-None, not truthiness)
        code, body = req("POST", "/topics/b/t", {"event_id": 1, "event_type": "x"}, auth)
        assert code == 202, body
        # bearer scheme case-insensitive
        code, _ = req("POST", "/topics/b/t", {"event_id": 2, "event_type": "x"},
                      {"Authorization": f"bearer {empty_tok}"})
        assert code == 202
        # negative Content-Length -> immediate 400
        code, _ = req("POST", "/topics/b/t", None, auth, raw_len=-1)
        assert code == 400
        # malformed event (string event_id into long) -> 400, not a reset
        code, body = req("POST", "/topics/b/t", {"event_id": "not-a-long"}, auth)
        assert code == 400, body
        # /health: liveness open, registry gated
        code, body = req("GET", "/health")
        assert code == 200 and "topics" not in body
        code, body = req("GET", "/health", None, auth)
        assert code == 200 and ["b", "t"] in body["topics"]
    finally:
        gw.stop()
        agency.close(remove_logs=True)


def test_claims_udf_malformed_iat_degrades_to_null(spark):
    """r6 review: a VALIDLY-SIGNED token with a non-numeric 'iat' (exp/nbf
    are pre-screened by _validated_claims; iat is not) must degrade that
    field to NULL inside the UDF, never kill the Spark task — one bad
    input must never kill the batch."""
    from event_streaming_spark.functions.auth import claims_udf, mint_hs256

    toks = [
        mint_hs256({"sub": "ok", "iat": 1700000000}, "s"),
        mint_hs256({"sub": "bad-str", "iat": "x"}, "s"),
        mint_hs256({"sub": "bad-list", "iat": [1, 2]}, "s"),
    ]
    df = spark.createDataFrame([(t,) for t in toks], "token STRING")
    out = {
        r["c"]["sub"]: r["c"]["iat"]
        for r in df.select(claims_udf("s")(F.col("token")).alias("c")).collect()
    }
    assert out["ok"] == 1700000000
    assert out["bad-str"] is None and out["bad-list"] is None

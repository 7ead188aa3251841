"""Build the 10x scaling replica used by tools/scale_check.py.

Replicates every sf0.1 table N times (default 10) with all key columns
shifted by replica_index * key_domain_span, producing N disjoint
referentially-consistent universes — joins keep their fan-in, dedup/ANN
candidate counts grow with the data as they would in production, and
multi-row-group parquet engages every core like a real dataset would.

Usage: python tools/make_sfbig.py [--src /root/testdata/sf0.1] [--dst /tmp/sfbig] [--n 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# key column -> (table that defines its domain, defining column)
_DOMAINS = {
    "regionkey": ("region", "r_regionkey"),
    "nationkey": ("nation", "n_nationkey"),
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _domain_for(col: str) -> str | None:
    if col in ("event_id", "user_id", "doc_id", "vec_id"):
        return col
    for dom in ("regionkey", "nationkey", "custkey", "suppkey", "partkey", "orderkey"):
        if col.endswith(dom):
            return dom
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sfbig")
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.src}/{t}.parquet')")

    spans = {
        dom: con.sql(f"SELECT max({col}) + 1 FROM {tbl}").fetchone()[0]
        for dom, (tbl, col) in _DOMAINS.items()
    }

    for t in TABLES:
        cols = [r[0] for r in con.sql(f"DESCRIBE {t}").fetchall()]
        exprs = []
        for c in cols:
            dom = _domain_for(c)
            exprs.append(f"{c} + k*{spans[dom]} AS {c}" if dom else c)
        sel = (
            f"SELECT {', '.join(exprs)} FROM {t}, "
            f"(SELECT unnest(range({args.n})) AS k)"
        )
        con.sql(
            f"COPY ({sel}) TO '{args.dst}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 65536)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{args.dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Differential test: every catalog query vs its DuckDB oracle at sf0.001.

This mirrors the driver's t2 correctness gate (row count + sorted column
names + order-insensitive canonical values) — see tools/check_oracle.py.
"""

from __future__ import annotations

import pytest

from event_streaming_spark.plans import REGISTRY
from tools.check_oracle import normalize

from tests.conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only contract: runs, stable schema, deterministic row count
        assert isinstance(srows, list)
        assert len(sdf.columns) > 0
        return
    rel = duck.sql(q.oracle)
    ocols, orows = list(rel.columns), rel.fetchall()
    sc, sv = normalize(sdf.columns, srows)
    oc, ov = normalize(ocols, orows)
    assert sc == oc, f"column names differ: {sc} vs {oc}"
    assert len(sv) == len(ov), f"row count differs: {len(sv)} vs {len(ov)}"
    assert sv == ov


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_output_types_no_hugeint(name, duck):
    """No oracle may output a HUGEINT/UHUGEINT column.

    DuckDB widens sum() over integers to int128; Spark's widest integral
    type is BIGINT, and value hashers that normalize via pandas/arrow
    render the two differently (the r2 `corpus_curation_end_to_end`
    driver-red row).  Every aggregate an oracle outputs must therefore be
    cast to BIGINT (or DOUBLE/DECIMAL) explicitly.
    """
    q = REGISTRY[name]
    if q.oracle is None:
        return
    rel = duck.sql(q.oracle)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not bad, f"{name}: HUGEINT output columns {bad} — cast to BIGINT in the oracle"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())

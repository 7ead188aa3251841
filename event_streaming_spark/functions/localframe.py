"""JVM-side construction of small local DataFrames.

``spark.createDataFrame(rows, schema)`` on a Python list builds a
``ParallelCollectionRDD`` of PICKLED rows: every evaluation of the plan
round-trips a Python worker (daemon spawn + pickle decode).  On hosts
where process spawn is expensive (sandboxed/virtualized kernels — the
bench box included) that costs SECONDS per evaluation of even a 4-row
frame (measured 6-7 s per noop run of a 4-row pickle frame vs 0.11-0.2 s
for the same rows through Arrow), and the cost recurs on every
re-execution of the plan because the Python leg is part of the RDD, not
of its construction (optimization guide §4: every Python path pays the
JVM↔Python boundary; §4.1: control HOW data crosses — Arrow batches,
not pickled rows).

:func:`local_frame` keeps the ``(rows, schema)`` contract of
``createDataFrame`` but ships the rows through driver-side Arrow into a
JVM-backed relation: list → pandas(dtype=object) → Arrow batches → JVM.
Execution then never touches a Python worker.  Empty row lists build a
zero-row JVM relation directly (the pickle path pays the worker cost
even for zero rows — measured 0.8-2.9 s).  Any conversion failure falls
back to the classic path: semantics are identical either way, only the
transport differs.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_struct(schema: str | T.StructType) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    parsed = T._parse_datatype_string(schema)
    if not isinstance(parsed, T.StructType):
        raise ValueError(f"local_frame schema must describe a struct: {schema!r}")
    return parsed


def local_frame(
    spark: SparkSession,
    rows: Iterable[Any],
    schema: str | T.StructType,
) -> DataFrame:
    """Drop-in replacement for ``spark.createDataFrame(rows, schema)`` on
    SMALL driver-local row lists whose plan may be evaluated (possibly
    repeatedly) inside a query — offsets tables, centroid seeds, literal
    dimensions, collected drain results.

    Rows may be tuples, ``Row`` objects, or dicts keyed by field name.
    """
    st = _as_struct(schema)
    try:
        import pandas as _pd

        if isinstance(rows, _pd.DataFrame):
            # pandas input already rides the Arrow conversion path.
            return spark.createDataFrame(rows, st)
    except ImportError:  # pragma: no cover
        pass
    rows = list(rows)
    if not rows:
        # Zero-row JVM relation with the exact schema — no RDD at all.
        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
        )
    try:
        import pandas as pd

        names = [f.name for f in st.fields]
        if isinstance(rows[0], dict):
            data = [tuple(r.get(n) for n in names) for r in rows]
        else:
            data = [tuple(r) for r in rows]
        # pandas→Arrow treats a float NaN cell as MISSING (it becomes
        # NULL on the Spark side), while the pickle path preserves it as
        # NaN — a value change the oracle hash would catch.  NaN rows
        # take the classic path; everything else rides Arrow.
        if any(
            isinstance(c, float) and c != c for row in data for c in row
        ):
            return spark.createDataFrame(rows, st)
        pdf = pd.DataFrame(data, columns=names, dtype=object)
        return spark.createDataFrame(pdf, st)
    except Exception:  # pragma: no cover — conversion edge case
        return spark.createDataFrame(rows, st)

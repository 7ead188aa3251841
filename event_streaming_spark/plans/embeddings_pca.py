"""PCA over the embeddings table — top principal component by POWER
ITERATION in exact integer arithmetic, oracle-paired.

The missing linear-algebra primitive of the embedding toolkit (k-means,
PQ, IVF, LSH are already in the catalog): the dominant eigenvector of
the covariance matrix, used in real pipelines for whitening, ABTT
("all-but-the-top") embedding post-processing, dimensionality checks and
drift monitoring.

Spark-first shape (the 100 TB story):
  * the only data-sized pass is the SECOND-MOMENT accumulation — one
    ``mapInPandas`` stage computes per-batch ``XᵀX`` partials with a
    vectorized numpy matmul (D×D int64 per batch) plus per-dim sums and
    a count, emitting ≤ D²+D+1 rows per task; the final combine is a
    4161-key aggregate.  The corpus never shuffles and is read ONCE.
  * the eigensolve itself runs on the DRIVER over the D²-bounded scatter
    matrix (same topology precedent as the k-means driver-held
    centroids: D=64 → 4096 ints; even D=4096 → 16M ints is driver-trivial
    next to a 100 TB corpus).
  * determinism: quantized inputs (``floor(x·1000+0.5)``), the scatter
    matrix as exact int64 ``n·Σvᵢvⱼ − sᵢ·sⱼ``, and a fixed 10-round
    power iteration whose rescale step is a magnitude-truncating integer
    division — Spark's driver math and DuckDB's unrolled CTE chain agree
    BITWISE, so the approximate eigenvector itself hash-verifies (the
    same exactness discipline as the integer PageRank,
    operators/graph.py).

Magnitude audit (scale 1e3 inputs, NSCALE 1e4, VSCALE 1e3, D=64):
  |R| ≤ n·1e6, |M| = |n·R − s·s| ≤ n²·1e6 → |M·NSCALE| ≤ n²·1e10:
  int64-safe for n ≤ ~30k rows (every SF + the 10× replica; beyond that
  the M aggregate moves to DECIMAL(38,0), shape unchanged).  Iteration:
  |w| ≤ NSCALE·VSCALE·D = 6.4e8; Rayleigh numerator ≤ NSCALE·VSCALE²·D²
  = 4e13 — all int64.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.localframe import local_frame
from event_streaming_spark.plans.catalog import load, register

_DIM = 64
_QSCALE = 1000  # input quantization (matches k-means _KM_SCALE)
_NSCALE = 10_000  # scatter-matrix normalization target
_VSCALE = 1000  # iteration-vector normalization target
_ROUNDS = 10


def _tdiv(a: int, b: int) -> int:
    """Magnitude-truncating division (toward zero), b > 0 — the ONE
    division semantics all three evaluators share (Spark `div` and
    DuckDB `//` both truncate toward zero; Python's `//` floors, so the
    driver math uses this helper instead)."""
    return (abs(a) // b) * (1 if a >= 0 else -1)


def _pca_oracle() -> str:
    """Unrolled CTE chain replicating the integer recurrence verbatim."""
    cte = [
        f"""
WITH q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
             x -> cast(floor(cast(x as double)*{_QSCALE} + 0.5) as bigint)) AS q
  FROM embeddings
),
e AS MATERIALIZED (SELECT vec_id, unnest(range(1, {_DIM + 1})) AS pos, unnest(q) AS v FROM q),
nn AS MATERIALIZED (SELECT count(*) AS n FROM q),
s AS MATERIALIZED (SELECT pos, sum(v) AS s FROM e GROUP BY pos),
r AS MATERIALIZED (SELECT a.pos AS i, b.pos AS j, sum(a.v * b.v) AS r
      FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
m AS MATERIALIZED (SELECT i, j, nn.n * r.r - si.s * sj.s AS m
      FROM r, nn
      JOIN s si ON si.pos = r.i
      JOIN s sj ON sj.pos = r.j),
mxm AS MATERIALIZED (SELECT greatest(max(abs(m)), 1) AS mx FROM m),
mn AS MATERIALIZED (SELECT i, j,
              (abs(m) * {_NSCALE} // mx)
              * (CASE WHEN m < 0 THEN -1 ELSE 1 END) AS m
       FROM m, mxm),
v0 AS MATERIALIZED (SELECT pos, cast({_VSCALE} AS BIGINT) AS v FROM s)"""
    ]
    for t in range(_ROUNDS):
        cte.append(
            f"""
w{t} AS MATERIALIZED (SELECT mn.i AS pos, sum(mn.m * v{t}.v) AS w
        FROM mn JOIN v{t} ON mn.j = v{t}.pos GROUP BY mn.i),
wm{t} AS MATERIALIZED (SELECT greatest(max(abs(w)), 1) AS mx FROM w{t}),
v{t + 1} AS MATERIALIZED (SELECT pos,
              (abs(w) * {_VSCALE} // mx)
              * (CASE WHEN w < 0 THEN -1 ELSE 1 END) AS v
        FROM w{t}, wm{t})"""
        )
    vt = f"v{_ROUNDS}"
    cte.append(
        f"""
sgn AS MATERIALIZED (SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
        FROM {vt} ORDER BY abs(v) DESC, pos ASC LIMIT 1),
raynum AS MATERIALIZED (SELECT sum(mn.m * a.v * b.v) AS num
           FROM mn JOIN {vt} a ON a.pos = mn.i JOIN {vt} b ON b.pos = mn.j),
rayden AS MATERIALIZED (SELECT greatest(sum(v * v), 1) AS den FROM {vt}),
ray AS MATERIALIZED (SELECT (abs(num) // den) * (CASE WHEN num < 0 THEN -1 ELSE 1 END)
          AS rayleigh
        FROM raynum, rayden)"""
    )
    select = f"""
SELECT cast(pos - 1 AS BIGINT) AS dim,
       cast(v * sg AS BIGINT) AS loading_milli,
       round(cast(v * sg AS DOUBLE) / {_VSCALE}.0, 3) AS loading,
       cast(rayleigh AS BIGINT) AS rayleigh_scaled
FROM {vt}, sgn, ray
ORDER BY dim"""
    return ",".join(cte) + select


def _moment_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch XᵀX / Σx / n partials — the map-side combine of the
    covariance pass.  Emits (i, j, val): j=-1 rows are per-dim sums,
    (i=-1, j=-1) is the row count."""
    import numpy as np

    for pdf in batches:
        if pdf.empty:
            continue
        x = np.stack(pdf["q"].to_numpy()).astype(np.int64)  # (n_b, D)
        r = x.T @ x  # exact: |v|<=1e3+eps, n_b<=10k -> ~1e10 per cell
        ii, jj = np.indices(r.shape)
        out = pd.DataFrame(
            {"i": ii.ravel(), "j": jj.ravel(), "val": r.ravel()}
        )
        sums = pd.DataFrame(
            {"i": np.arange(x.shape[1]), "j": -1, "val": x.sum(axis=0)}
        )
        cnt = pd.DataFrame({"i": [-1], "j": [-1], "val": [x.shape[0]]})
        yield pd.concat([out, sums, cnt], ignore_index=True)


@register(
    "emb_pca_power_iteration",
    _pca_oracle(),
    tags=("llm", "ann", "stats", "linalg"),
    bench=True,  # the linalg covariance pass joins the tracked set
)
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance by 10 rounds
    of exact-integer power iteration; loadings hash-equal the oracle."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _QSCALE + F.lit(0.5)).cast("long"),
        ).alias("q")
    )
    partials = q.mapInPandas(_moment_partials, "i int, j int, val long")
    moments = partials.groupBy("i", "j").agg(F.sum("val").alias("val")).collect()

    # ---- driver-side eigensolve over the D²-bounded scatter matrix ----
    raw = [[0] * _DIM for _ in range(_DIM)]
    s = [0] * _DIM
    n = 0
    for row in moments:
        if row["i"] == -1:
            n = row["val"]
        elif row["j"] == -1:
            s[row["i"]] = row["val"]
        else:
            raw[row["i"]][row["j"]] = row["val"]
    m = [[n * raw[i][j] - s[i] * s[j] for j in range(_DIM)] for i in range(_DIM)]
    mx = max(max(abs(c) for c in rowv) for rowv in m) or 1
    mn = [[_tdiv(c * _NSCALE, mx) for c in rowv] for rowv in m]

    v = [_VSCALE] * _DIM
    for _ in range(_ROUNDS):
        w = [sum(mn[i][j] * v[j] for j in range(_DIM)) for i in range(_DIM)]
        wmx = max(abs(c) for c in w) or 1
        v = [_tdiv(c * _VSCALE, wmx) for c in w]

    # sign canonicalization: the max-|loading| dim (lowest index on ties)
    # points positive, so the direction is presentation-stable
    lead = max(range(_DIM), key=lambda i: (abs(v[i]), -i))
    sg = -1 if v[lead] < 0 else 1
    v = [c * sg for c in v]
    num = sum(mn[i][j] * v[i] * v[j] for i in range(_DIM) for j in range(_DIM))
    den = sum(c * c for c in v) or 1
    rayleigh = _tdiv(num, den)

    rows = [
        (i, v[i], round(v[i] / float(_VSCALE), 3), rayleigh) for i in range(_DIM)
    ]
    return local_frame(spark, 
        rows,
        "dim bigint, loading_milli bigint, loading double, rayleigh_scaled bigint",
    ).orderBy("dim")

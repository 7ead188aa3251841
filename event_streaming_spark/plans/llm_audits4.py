"""Round-11 embedding audits: diagonal-Mahalanobis OOD detection.

* ``emb_ood_mahalanobis_diag`` — per-label out-of-distribution audit
  under a diagonal-covariance Gaussian fit (Lee et al. 2018's
  Mahalanobis OOD detector, diagonal variant): each dimension's mean
  and variance are fit per label from exact integer/decimal moments,
  each vector's variance-normalized squared distance
  d² = Σ_dim (x−μ)²/(σ²+ε) accumulates as 6dp fixed-point terms (the
  per-dim rounding makes the 64-term sum order-free), and the report
  flags vectors with d² above 2x the label mean — the
  variance-aware upgrade of ``emb_label_centroid_outliers``'s raw
  euclidean screen (a tight cluster with one loose dimension stops
  masking outliers in the tight dimensions).

100 TB shape: one posexplode pass (64x row fanout of skinny rows) →
a (label x dim)-keyed wordcount aggregate (640 groups, map-side
combined) → the 640-row stats table BROADCASTS back onto the same
exploded stream → per-vector reduce.  The corpus shuffles once, keyed
by (vec_id) at reduce width; everything else is broadcast-sized.

Reference parity note: the reference engine has no vector surface
(SURVEY §2); extends the embedding audit pack (plans/llm_audits*.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.plans.catalog import load, register, spread

_OOD_EPS = 1e-9  # variance floor: keeps a constant dimension finite

_OOD_ORACLE = f"""
WITH x AS MATERIALIZED (
  SELECT vec_id, label, d AS dim,
         cast(round(cast(embedding[d + 1] AS DOUBLE) * 1e6) AS BIGINT) AS x6
  FROM embeddings, range(64) t(d)
), st AS MATERIALIZED (
  SELECT label, dim, cast(count(*) AS BIGINT) AS n,
         cast(sum(x6) AS BIGINT) AS s1,
         sum(cast(x6 AS DECIMAL(19,0)) * cast(x6 AS DECIMAL(19,0))) AS s2
  FROM x GROUP BY label, dim
), mu AS (
  SELECT label, dim,
         (cast(s1 AS DOUBLE) / 1e6) / n AS mu,
         (cast(s2 AS DOUBLE) / 1e12
          - (cast(s1 AS DOUBLE) / 1e6) * (cast(s1 AS DOUBLE) / 1e6) / n)
           / (n - 1) AS var
  FROM st
), md AS MATERIALIZED (
  SELECT vec_id, label, cast(sum(t_fp) AS BIGINT) AS md2_fp6
  FROM (
    SELECT x.vec_id, x.label,
           cast(round(((cast(x.x6 AS DOUBLE) / 1e6 - mu.mu)
                       * (cast(x.x6 AS DOUBLE) / 1e6 - mu.mu)
                       / (mu.var + {_OOD_EPS!r})) * 1e6) AS BIGINT) AS t_fp
    FROM x JOIN mu ON mu.label = x.label AND mu.dim = x.dim
  ) GROUP BY vec_id, label
), lab AS (
  SELECT label, cast(count(*) AS BIGINT) AS n_vecs,
         cast(sum(md2_fp6) // count(*) AS BIGINT) AS mean_md2_fp6,
         cast(max(md2_fp6) AS BIGINT) AS max_md2_fp6
  FROM md GROUP BY label
)
SELECT l.label, l.n_vecs, l.mean_md2_fp6, l.max_md2_fp6,
       cast(sum(CASE WHEN m.md2_fp6 > 2 * l.mean_md2_fp6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_ood
FROM md m JOIN lab l ON l.label = m.label
GROUP BY l.label, l.n_vecs, l.mean_md2_fp6, l.max_md2_fp6
ORDER BY l.label
"""


@register(
    "emb_ood_mahalanobis_diag",
    _OOD_ORACLE,
    tags=("llm", "quality", "audit", "ann"),
)
def emb_ood_mahalanobis_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label diagonal-Mahalanobis OOD counts.

    Scale design: the per-(label, dim) moment table is 640 rows —
    it broadcasts back onto the exploded vector stream, so the corpus
    is scanned twice as narrow rows and shuffled once (the per-vector
    reduce).  Moments use the z-test DECIMAL discipline (Σx6² passes
    int64 at ~1e5 µ-scaled rows); per-dim terms round to 6dp fixed
    point BEFORE the 64-term sum so d² is an exact integer on both
    engines; the 2x-mean flag is pure int64.
    """
    emb = spread(load(spark, sf_dir, "embeddings"))
    x = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "xf"),
    ).select(
        "vec_id",
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("xf").cast("double") * 1e6).cast("long").alias("x6"),
    )
    x6d = F.col("x6").cast("decimal(19,0)")
    st = x.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x6").cast("long").alias("s1"),
        F.sum(x6d * x6d).alias("s2"),
    )
    mu = st.select(
        "label",
        "dim",
        ((F.col("s1").cast("double") / 1e6) / F.col("n")).alias("mu"),
        (
            (
                F.col("s2").cast("double") / 1e12
                - (F.col("s1").cast("double") / 1e6)
                * (F.col("s1").cast("double") / 1e6)
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("var"),
    )
    dev = F.col("x6").cast("double") / 1e6 - F.col("mu")
    t_fp = F.round(dev * dev / (F.col("var") + F.lit(_OOD_EPS)) * 1e6).cast(
        "long"
    )
    md = (
        x.join(F.broadcast(mu), ["label", "dim"])
        .select("vec_id", "label", t_fp.alias("t_fp"))
        .groupBy("vec_id", "label")
        .agg(F.sum("t_fp").cast("long").alias("md2_fp6"))
    )
    lab = md.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.expr("sum(md2_fp6) div count(*)").cast("long").alias("mean_md2_fp6"),
        F.max("md2_fp6").cast("long").alias("max_md2_fp6"),
    )
    return (
        md.join(F.broadcast(lab), "label")
        .groupBy("label", "n_vecs", "mean_md2_fp6", "max_md2_fp6")
        .agg(
            F.sum(
                F.when(F.col("md2_fp6") > 2 * F.col("mean_md2_fp6"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_ood")
        )
        .orderBy("label")
    )

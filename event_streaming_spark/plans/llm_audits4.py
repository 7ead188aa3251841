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


# ---------------------------------------------------------------------------
# Mutual-kNN graph reciprocity audit.
# ---------------------------------------------------------------------------

_REC_PANEL = 512  # deterministic panel size target (work = panel², constant)
_REC_K = 5
_REC_HUB_MULT = 2  # in-degree >= 2k -> hub (Radovanović 2010 convention)

_REC_ORACLE = f"""
WITH step AS (
  SELECT greatest(1, count(*) // {_REC_PANEL}) AS s FROM embeddings
), panel AS MATERIALIZED (
  SELECT vec_id, label, embedding FROM embeddings, step
  WHERE vec_id % step.s = 0
), edges AS MATERIALIZED (
  SELECT qid, nid FROM (
    SELECT q.vec_id AS qid, c.vec_id AS nid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(
               list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
               6) DESC, c.vec_id) AS rn
    FROM panel q JOIN panel c ON c.vec_id <> q.vec_id
  ) WHERE rn <= {_REC_K}
), pernode AS (
  SELECT e.qid,
         cast(count(*) AS BIGINT) AS n_out,
         cast(coalesce(sum(CASE WHEN r.qid IS NOT NULL THEN 1 END), 0) AS BIGINT)
           AS n_recip
  FROM edges e
  LEFT JOIN edges r ON r.qid = e.nid AND r.nid = e.qid
  GROUP BY e.qid
), indeg AS (
  SELECT nid, cast(count(*) AS BIGINT) AS deg FROM edges GROUP BY nid
)
SELECT p.label,
       cast(count(*) AS BIGINT) AS n_nodes,
       cast(sum(pn.n_out) AS BIGINT) AS n_edges,
       cast((2000000 * sum(pn.n_recip) + sum(pn.n_out))
            // (2 * sum(pn.n_out)) AS BIGINT) AS recip_ppm,
       cast(max(coalesce(i.deg, 0)) AS BIGINT) AS max_indegree,
       cast(coalesce(sum(CASE WHEN coalesce(i.deg, 0)
                               >= {_REC_HUB_MULT * _REC_K} THEN 1 END), 0)
            AS BIGINT) AS n_hubs
FROM panel p
JOIN pernode pn ON pn.qid = p.vec_id
LEFT JOIN indeg i ON i.nid = p.vec_id
GROUP BY p.label
ORDER BY p.label
"""


@register(
    "emb_knn_graph_reciprocity",
    _REC_ORACLE,
    tags=("llm", "ann", "graph", "audit"),
)
def emb_knn_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN reciprocity + in-degree audit over a deterministic panel.

    Low edge reciprocity and heavy in-degree hubs are the two standard
    predictors of ANN recall loss (Radovanović et al. 2010; the
    k-NN-graph quality literature) — this audit reads both per label.

    Scale design: the graph is built on a DETERMINISTIC fixed-size
    panel (vec_id % step == 0, step = greatest(1, n div _REC_PANEL)),
    so the exact all-pairs kNN costs panel² cosines — CONSTANT as the
    corpus grows, the same bounded-audit shape as the hubness query
    (plans/llm_audits3.py).  The panel broadcasts to both sides of the
    pair join; everything after the top-k is panel·k-row frames.
    """
    from event_streaming_spark.functions.numeric import dot, l2_norm
    from event_streaming_spark.operators.ranks import topk_per_group

    emb = load(spark, sf_dir, "embeddings")
    step = emb.agg(
        F.greatest(
            F.lit(1).cast("long"), F.expr(f"count(1) div {_REC_PANEL}")
        ).alias("s")
    )
    # norms compute ONCE per panel node before the panel² fanout: the
    # per-pair cosine is then one zip-fold (the dot) instead of three
    # (the r10 bruteforce/hubness lesson — HOF folds never enter
    # codegen, so fold count IS the cost model).  l2_norm is the same
    # fold as inside cosine(), so every double is unchanged.
    panel = (
        emb.crossJoin(F.broadcast(step))
        .where(F.col("vec_id") % F.col("s") == 0)
        .select(
            "vec_id", "label", "embedding",
            l2_norm(F.col("embedding")).alias("nrm"),
        )
    )
    q = panel.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = panel.join(
        F.broadcast(q), F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        F.col("vec_id").alias("nid"),
        F.round(
            dot(F.col("qv"), F.col("embedding"))
            / (F.col("q_nrm") * F.col("nrm")),
            6,
        ).alias("cos_sim"),
    )
    from event_streaming_spark.operators.materialize import materialize

    # edges feeds THREE consumers (forward list, reversed probe, in-degree)
    # — pin the panel·k-row frame once or the panel² cosine pass re-runs
    # per consumer.
    edges = materialize(
        topk_per_group(
            pairs, "qid", [F.desc("cos_sim"), F.asc("nid")], _REC_K, rn_col="rn"
        ).select("qid", "nid"),
        "knn-recip-edges",
    )
    rev = edges.select(
        F.col("qid").alias("r_qid"), F.col("nid").alias("r_nid")
    )
    pernode = (
        edges.join(
            rev,
            (F.col("r_qid") == F.col("nid")) & (F.col("r_nid") == F.col("qid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_out"),
            F.coalesce(
                F.sum(F.when(F.col("r_qid").isNotNull(), 1)), F.lit(0)
            )
            .cast("long")
            .alias("n_recip"),
        )
    )
    indeg = edges.groupBy("nid").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    return (
        panel.select("vec_id", "label")
        .join(pernode, F.col("qid") == F.col("vec_id"))
        .join(indeg, indeg["nid"] == F.col("vec_id"), "left")
        .select(
            "label",
            "n_out",
            "n_recip",
            F.coalesce(F.col("deg"), F.lit(0)).alias("deg"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("n_out").cast("long").alias("n_edges"),
            F.expr(
                "(2000000 * sum(n_recip) + sum(n_out)) div (2 * sum(n_out))"
            )
            .cast("long")
            .alias("recip_ppm"),
            F.max("deg").cast("long").alias("max_indegree"),
            F.coalesce(
                F.sum(F.when(F.col("deg") >= _REC_HUB_MULT * _REC_K, 1)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_hubs"),
        )
        .orderBy("label")
    )

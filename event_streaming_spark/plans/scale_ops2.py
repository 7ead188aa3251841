"""Sketches + hierarchy tranche.

- HyperLogLog and Count-Min with md5-derived hashes: the sketch is
  REPRODUCIBLE, so the approximate answers are full value-hash-verified
  against the oracle (engine-native sketches would force a rows-only
  check; as of r9 `agg_approx_distinct_sketch` uses this same recipe);
- parent-chain resolution by pointer doubling, pinned by a plain
  WITH RECURSIVE oracle — the recursive-CTE capability Spark lacks,
  re-expressed in O(log depth) shuffle rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.operators.hierarchy import resolve_to_root
from event_streaming_spark.operators.sketches import (
    count_min_lookup,
    count_min_table,
    hll_estimate,
    sql_count_min_estimates,
    sql_hll_estimate,
)
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# HLL distinct-count sketch, both correction branches in one query:
# user_id (~150·sf keys → linear-counting branch) and event_id (unique
# per row → raw-estimate branch).  The exact distinct count rides along
# so the result exhibits the approximation error while the VALUES remain
# bit-deterministic.
# ---------------------------------------------------------------------------

_HLL_ORACLE = f"""
SELECT 'event_id' AS key_name,
       (SELECT count(DISTINCT event_id) FROM events) AS exact_distinct,
       hll_estimate
FROM ({sql_hll_estimate("event_id", "events")})
UNION ALL
SELECT 'user_id' AS key_name,
       (SELECT count(DISTINCT user_id) FROM events) AS exact_distinct,
       hll_estimate
FROM ({sql_hll_estimate("user_id", "events")})
ORDER BY key_name
"""


@register("sketch_hll_distinct_cross_engine", _HLL_ORACLE, tags=("sketch", "agg"))
def sketch_hll_distinct_cross_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = None
    for key in ("event_id", "user_id"):
        est = hll_estimate(ev, F.col(key))
        exact = ev.agg(F.countDistinct(key).alias("exact_distinct"))
        branch = exact.crossJoin(est).select(
            F.lit(key).alias("key_name"), "exact_distinct", "hll_estimate"
        )
        out = branch if out is None else out.union(branch)
    return out.orderBy("key_name")


# ---------------------------------------------------------------------------
# Count-Min heavy-hitter estimates: the counter table is d·w rows no
# matter the key cardinality; estimates for the top-10 true-hot users
# come from a broadcast join against it.  cm_estimate ≥ true_cnt always
# (CM errs upward only) — the test asserts it.
# ---------------------------------------------------------------------------

_CM_ORACLE = f"""
WITH est AS ({sql_count_min_estimates("user_id", "events")}),
true_counts AS (
  SELECT cast(user_id AS VARCHAR) AS user_key, count(*) AS true_cnt
  FROM events GROUP BY 1
)
SELECT t.user_key, t.true_cnt, e.cm_estimate
FROM true_counts t JOIN est e ON e.k = t.user_key
ORDER BY true_cnt DESC, user_key
LIMIT 10
"""


@register("sketch_count_min_hot_users", _CM_ORACLE, tags=("sketch", "agg"))
def sketch_count_min_hot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cm = count_min_table(ev, F.col("user_id"))
    true_counts = ev.groupBy(F.col("user_id").cast("string").alias("user_key")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    est = count_min_lookup(cm, true_counts.select("user_key"), "user_key")
    return (
        true_counts.join(est, "user_key")
        .select("user_key", "true_cnt", "cm_estimate")
        .orderBy(F.desc("true_cnt"), "user_key")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Parent-chain hierarchy: parent(c) = c div 7 (self-root below 7) — a
# deterministic synthetic org-chart over customers, ~5 levels deep at
# sf0.01 and one level deeper every 7× more customers.  Spark resolves
# it in O(log depth) pointer-doubling rounds; the oracle walks it with
# WITH RECURSIVE.  Output: every customer's root and depth.
# ---------------------------------------------------------------------------

_HIER_ORACLE = """
WITH RECURSIVE walk(node, cur, d) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT node, cur // 7, d + 1 FROM walk WHERE cur >= 7
)
SELECT node AS c_custkey, cur AS root, d AS depth
FROM walk WHERE cur < 7
ORDER BY c_custkey
"""


@register("hier_customer_chain_depth", _HIER_ORACLE, tags=("hierarchy", "iterative"))
def hier_customer_chain_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    parents = cust.select(
        F.col("c_custkey").alias("node"),
        F.when(F.col("c_custkey") >= 7, F.expr("c_custkey div 7"))
        .otherwise(F.col("c_custkey"))
        .alias("parent"),
    )
    out = resolve_to_root(parents, "node", "parent")
    return out.select(
        F.col("node").alias("c_custkey"), "root", F.col("depth")
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Duplicated-span coverage: for every document, the fraction of its
# 3-token shingles that also occur in at least one OTHER document —
# the per-document "how much of me is boilerplate/copied" score that
# complements pair-level near-dup detection (a doc can be 40% copied
# without any single pair crossing a similarity threshold).
#
# Scale shape: explode to (doc, shingle-hash) — linear in token count —
# then ONE count-distinct agg keyed on the hash and ONE join back on the
# same key (AQE reuses the partitioning).  No pair join anywhere: cost
# is corpus-linear, unlike pairwise Jaccard.
# ---------------------------------------------------------------------------

_DUPSPAN_ORACLE = """
WITH sh AS (
  SELECT doc_id, unnest({SHINGLES}) AS h FROM documents
), freq AS (
  SELECT h, count(DISTINCT doc_id) AS nd FROM sh GROUP BY h
)
SELECT sh.doc_id,
       count(*) AS n_shingles,
       cast(sum(CASE WHEN freq.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       round(sum(CASE WHEN freq.nd >= 2 THEN 1 ELSE 0 END)
             / cast(count(*) AS DOUBLE), 6) AS dup_fraction
FROM sh JOIN freq USING (h)
GROUP BY sh.doc_id
ORDER BY sh.doc_id
"""


def _dupspan_oracle() -> str:
    from event_streaming_spark.operators.similarity import sql_shingle_hashes

    return _DUPSPAN_ORACLE.replace("{SHINGLES}", sql_shingle_hashes("text"))


@register(
    "text_dup_span_fraction", _dupspan_oracle(), tags=("llm", "text", "dedup"), bench=True
)
def text_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.similarity import shingle_hashes
    from event_streaming_spark.plans.catalog import spread

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = docs.select(
        "doc_id", F.explode(shingle_hashes(F.col("text"))).alias("h")
    )
    freq = sh.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    shared = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
    return (
        sh.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            shared.alias("n_shared"),
            F.round(shared / F.count(F.lit(1)).cast("double"), 6).alias(
                "dup_fraction"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph, exact-integer recurrence: centrality
# picks canonical representatives and surfaces hub documents.  Both
# engines run the identical int64 recurrence (operators/graph.py); the
# oracle unrolls the fixed 3 rounds as chained CTEs.
# ---------------------------------------------------------------------------


def _pagerank_oracle() -> str:
    from event_streaming_spark.operators.graph import sql_pagerank_integer
    from event_streaming_spark.plans.llm_similarity import _LSH_ORACLE

    return (
        sql_pagerank_integer(
            "SELECT doc_id AS node FROM documents",
            f"SELECT doc_a AS src, doc_b AS dst FROM ({_LSH_ORACLE})",
        ).replace("SELECT node, pr_scaled FROM r3",
                  "SELECT node AS doc_id, pr_scaled FROM r3 ORDER BY doc_id")
    )


@register(
    "graph_pagerank_near_dup", _pagerank_oracle(), tags=("graph", "iterative", "llm"), bench=True
)
def graph_pagerank_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.graph import pagerank_integer
    from event_streaming_spark.plans.llm_similarity import minhash_lsh_near_dup_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id")
    edges = minhash_lsh_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    pr = pagerank_integer(docs, edges, iters=3)
    return pr.select(F.col("node").alias("doc_id"), "pr_scaled").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Personalized PageRank from a flagged SEED set over the same near-dup
# graph — the 'expand this set through similarity' primitive: start
# from known-contaminated (or known-good) documents and rank everything
# by proximity-weighted reachability.  Same exact-integer recurrence as
# the global PageRank (teleport restricted to seeds), 4 unrolled
# rounds; seeds are the deterministic doc_id % 53 == 0 subset so the
# query is self-contained at any SF.  Scale: per round one shuffle join
# + one keyed agg, like every fixed-round iterative op here.
# ---------------------------------------------------------------------------


def _ppr_oracle() -> str:
    from event_streaming_spark.operators.graph import sql_ppr_integer
    from event_streaming_spark.plans.llm_similarity import _LSH_ORACLE

    return (
        sql_ppr_integer(
            "SELECT doc_id AS node, CASE WHEN doc_id % 53 = 0 THEN 1 ELSE 0 END"
            " AS is_seed FROM documents",
            f"SELECT doc_a AS src, doc_b AS dst FROM ({_LSH_ORACLE})",
            iters=4,
        ).replace(
            "SELECT node, is_seed, pr_scaled FROM r4",
            "SELECT node AS doc_id, is_seed, pr_scaled FROM r4 ORDER BY doc_id",
        )
    )


@register(
    "graph_ppr_seed_expansion",
    _ppr_oracle(),
    tags=("graph", "iterative", "llm"),
    bench=True,
)
def graph_ppr_seed_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.graph import ppr_integer
    from event_streaming_spark.plans.llm_similarity import minhash_lsh_near_dup_pairs

    nodes = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node"),
        F.when(F.col("doc_id") % 53 == 0, 1).otherwise(0).alias("is_seed"),
    )
    edges = minhash_lsh_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    out = ppr_integer(nodes, edges, iters=4)
    return out.select(
        F.col("node").alias("doc_id"), "is_seed", "pr_scaled"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch: deterministic uniform sample per group (the k
# smallest md5-hashes), quantiles read off the sorted sample by integer
# position — approximate quantiles whose VALUES are bit-reproducible in
# both engines, the quantile analogue of the HLL story.  The hash
# threshold prefilter keeps the ranking window at ~4k rows per group
# instead of n (see operators/sketches.py::bottomk_quantile_sample).
# ---------------------------------------------------------------------------


def _bottomk_oracle() -> str:
    from event_streaming_spark.operators.sketches import sql_bottomk_quantile_sample

    sample = sql_bottomk_quantile_sample("event_type", "value", "event_id", "events")
    return f"""
WITH sample AS ({sample}),
pos AS (
  SELECT grp, val,
         row_number() OVER (PARTITION BY grp ORDER BY val, h) AS rv,
         count(*) OVER (PARTITION BY grp) AS s
  FROM sample
)
SELECT grp AS event_type,
       max(CASE WHEN rv = 1 + (s - 1) // 2 THEN val END) AS p50_est,
       max(CASE WHEN rv = 1 + (9 * (s - 1)) // 10 THEN val END) AS p90_est,
       max(s) AS sample_n
FROM pos
GROUP BY grp
ORDER BY event_type
"""


@register("sketch_bottomk_value_quantiles", _bottomk_oracle(), tags=("sketch", "agg"))
def sketch_bottomk_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from event_streaming_spark.operators.sketches import bottomk_quantile_sample

    ev = load(spark, sf_dir, "events")
    samp = bottomk_quantile_sample(
        ev, F.col("event_type"), F.col("value"), F.col("event_id")
    )
    w = Window.partitionBy("grp").orderBy("val", "h")
    pos = samp.select(
        "grp",
        "val",
        F.row_number().over(w).alias("rv"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("s"),
    )
    return (
        pos.groupBy(F.col("grp").alias("event_type"))
        .agg(
            F.max(F.when(F.col("rv") == 1 + F.expr("(s - 1) div 2"), F.col("val"))).alias(
                "p50_est"
            ),
            F.max(
                F.when(F.col("rv") == 1 + F.expr("(9 * (s - 1)) div 10"), F.col("val"))
            ).alias("p90_est"),
            F.max("s").alias("sample_n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Grouped HLL: distinct users per event type — the per-segment form the
# sketch is actually deployed in (distinct users per day/source/cohort).
# One (grp, bucket) shuffle, ≤ m register rows per group.
# ---------------------------------------------------------------------------


def _hll_by_oracle() -> str:
    from event_streaming_spark.operators.sketches import sql_hll_estimate_by

    inner = sql_hll_estimate_by("event_type", "user_id", "events")
    return f"""
SELECT grp AS event_type, hll_estimate,
       (SELECT count(DISTINCT user_id) FROM events e2 WHERE e2.event_type = s.grp)
         AS exact_distinct
FROM ({inner}) s
ORDER BY event_type
"""


@register("sketch_hll_users_per_type", _hll_by_oracle(), tags=("sketch", "agg"))
def sketch_hll_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.sketches import hll_estimate_by

    ev = load(spark, sf_dir, "events")
    est = hll_estimate_by(ev, F.col("event_type"), F.col("user_id"))
    exact = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        est.join(exact, "grp")
        .select(F.col("grp").alias("event_type"), "hll_estimate", "exact_distinct")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Canonical representative per near-dup cluster, chosen by CENTRALITY:
# cluster membership from connected components, the winner per cluster =
# highest integer-PageRank (tie → smallest doc_id).  This is the actual
# curation decision ("which duplicate do we keep?") upgraded from
# "arbitrary min id" to "the hub the others orbit" — and it composes two
# iterative operators plus an argmax entirely from verified pieces.
# ---------------------------------------------------------------------------


def _canonical_oracle() -> str:
    from event_streaming_spark.operators.graph import sql_pagerank_integer
    from event_streaming_spark.plans.curation import _CC_ORACLE
    from event_streaming_spark.plans.llm_similarity import _LSH_ORACLE

    pr = sql_pagerank_integer(
        "SELECT doc_id AS node FROM documents",
        f"SELECT doc_a AS src, doc_b AS dst FROM ({_LSH_ORACLE})",
    )
    return f"""
WITH clusters AS ({_CC_ORACLE}),
pr AS ({pr}),
joined AS (
  SELECT c.cluster_id, c.doc_id, p.pr_scaled
  FROM clusters c JOIN pr p ON p.node = c.doc_id
), ranked AS (
  SELECT cluster_id, doc_id, pr_scaled,
         row_number() OVER (
           PARTITION BY cluster_id ORDER BY pr_scaled DESC, doc_id
         ) AS r
  FROM joined
)
SELECT cluster_id, doc_id AS canonical_doc, pr_scaled AS canonical_pr
FROM ranked WHERE r = 1
ORDER BY cluster_id
"""


@register(
    "corpus_canonical_by_centrality",
    _canonical_oracle(),
    tags=("llm", "dedup", "graph", "iterative"),
    bench=True,
)
def corpus_canonical_by_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from event_streaming_spark.operators.components import connected_components
    from event_streaming_spark.operators.graph import pagerank_integer
    from event_streaming_spark.operators.materialize import materialize
    from event_streaming_spark.plans.llm_similarity import minhash_lsh_near_dup_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id")
    # one edge materialization feeds BOTH iterative operators
    edges = materialize(
        minhash_lsh_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b"),
        "canon-edges",
    )
    clusters = connected_components(docs, edges).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    pr = pagerank_integer(docs, edges, iters=3)
    joined = clusters.join(pr, clusters.doc_id == pr.node).select(
        "cluster_id", "doc_id", "pr_scaled"
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("pr_scaled"), "doc_id")
    return (
        joined.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc"),
            F.col("pr_scaled").alias("canonical_pr"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# HLL set algebra: distinct users who BOTH viewed and purchased,
# estimated from three sketches via inclusion-exclusion
# (|A∩B| ≈ est(A) + est(B) − est(A∪B)) — no join between the two event
# streams ever happens; the union sketch is register-max of the two
# sides' registers (the merge monoid), so the entire question costs
# three fixed-size sketches.  Exact values ride along for error audit.
# ---------------------------------------------------------------------------


def _hll_algebra_oracle() -> str:
    from event_streaming_spark.operators.sketches import sql_hll_estimate

    a = sql_hll_estimate("user_id", "events WHERE event_type = 'view'")
    b = sql_hll_estimate("user_id", "events WHERE event_type = 'purchase'")
    u = sql_hll_estimate(
        "user_id", "events WHERE event_type IN ('view', 'purchase')"
    )
    return f"""
SELECT round(a.hll_estimate, 4) AS est_view,
       round(b.hll_estimate, 4) AS est_purchase,
       round(u.hll_estimate, 4) AS est_union,
       round(a.hll_estimate + b.hll_estimate - u.hll_estimate, 4) AS est_both,
       (SELECT count(DISTINCT user_id) FROM events
        WHERE event_type = 'view'
          AND user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase'))
         AS exact_both
FROM ({a}) a, ({b}) b, ({u}) u
"""


@register("sketch_hll_set_intersection", _hll_algebra_oracle(), tags=("sketch", "agg"))
def sketch_hll_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.sketches import (
        hll_finalize,
        hll_merge,
        hll_registers,
    )

    ev = load(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view")
    buys = ev.where(F.col("event_type") == "purchase")
    ra = hll_registers(views, F.col("user_id"))
    rb = hll_registers(buys, F.col("user_id"))
    ea = hll_finalize(ra).select(F.col("hll_estimate").alias("est_view"))
    eb = hll_finalize(rb).select(F.col("hll_estimate").alias("est_purchase"))
    # union sketch = register-max merge; NOT a recount of the union rows
    eu = hll_finalize(hll_merge(ra.union(rb))).select(
        F.col("hll_estimate").alias("est_union")
    )
    exact = (
        views.select("user_id")
        .intersect(buys.select("user_id"))
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(exact)
        .select(
            F.round("est_view", 4).alias("est_view"),
            F.round("est_purchase", 4).alias("est_purchase"),
            F.round("est_union", 4).alias("est_union"),
            F.round(
                F.col("est_view") + F.col("est_purchase") - F.col("est_union"), 4
            ).alias("est_both"),
            "exact_both",
        )
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonality profile: per (event_type, ISO dow) volume and
# exact mean value, plus the deviation from the type's overall mean —
# the weekly-pattern diagnostic for traffic shaping.  One fact-sized
# agg to 7·types rows; the type-level mean comes from a second agg over
# the SUMMARY (35 rows), broadcast back.  ISO dow (Mon=1): Spark
# weekday()+1 == DuckDB isodow().
# ---------------------------------------------------------------------------

_SEASON_ORACLE = """
WITH by_dow AS (
  SELECT event_type, isodow(ts) AS dow, count(*) AS n,
         cast(sum(cast(round(value * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_v
  FROM events GROUP BY 1, 2
), typ AS (
  SELECT event_type, sum(sum_v) AS tot_v, sum(n) AS tot_n FROM by_dow GROUP BY 1
)
SELECT b.event_type, b.dow, b.n,
       round(b.sum_v / b.n, 6) AS mean_value,
       round(b.sum_v / b.n - t.tot_v / t.tot_n, 6) AS dev_from_type_mean
FROM by_dow b JOIN typ t USING (event_type)
ORDER BY event_type, dow
"""


@register("events_dow_seasonality", _SEASON_ORACLE, tags=("events", "timeseries"))
def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    by_dow = (
        ev.groupBy("event_type", F.expr("weekday(ts) + 1").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 1e6).cast("long")).cast("double") / 1e6
            ).alias("sum_v"),
        )
    )
    typ = by_dow.groupBy("event_type").agg(
        F.sum("sum_v").alias("tot_v"), F.sum("n").alias("tot_n")
    )
    return (
        by_dow.join(F.broadcast(typ), "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            F.round(F.col("sum_v") / F.col("n"), 6).alias("mean_value"),
            F.round(
                F.col("sum_v") / F.col("n") - F.col("tot_v") / F.col("tot_n"), 6
            ).alias("dev_from_type_mean"),
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# Join-size estimation from Count-Min sketches: |A ⋈_k B| is estimated
# by the inner product of the two sides' CM counter rows, min'd over the
# d hash rows — the classic optimizer statistic (AMS/CM inner product),
# computed WITHOUT touching the join itself.  Both sketches are d·w
# integers; the estimate is exact integer arithmetic, so it
# hash-verifies.  True join count rides along for the error audit.
# Upward-biased only (collisions add), like all CM estimates.
# ---------------------------------------------------------------------------

_CM_JOIN_ORACLE = f"""
WITH a AS (
  SELECT d, {{H}} % 256 AS pos, count(*) AS cnt
  FROM (SELECT cast(o_custkey AS VARCHAR) AS k FROM orders)
       CROSS JOIN (SELECT unnest(range(4)) AS d)
  GROUP BY 1, 2
), b AS (
  SELECT d, {{H}} % 256 AS pos, count(*) AS cnt
  FROM (SELECT cast(c_custkey AS VARCHAR) AS k FROM customer)
       CROSS JOIN (SELECT unnest(range(4)) AS d)
  GROUP BY 1, 2
), prods AS (
  SELECT a.d, sum(a.cnt * b.cnt) AS ip
  FROM a JOIN b ON a.d = b.d AND a.pos = b.pos
  GROUP BY a.d
)
SELECT (SELECT cast(min(ip) AS BIGINT) FROM prods) AS est_join_size,
       (SELECT count(*) FROM orders JOIN customer ON c_custkey = o_custkey)
         AS exact_join_size
"""


def _cm_join_oracle() -> str:
    from event_streaming_spark.functions.hashing import sql_stable_hash32

    h = sql_stable_hash32("cast(d AS VARCHAR) || '|' || k")
    return _CM_JOIN_ORACLE.replace("{H}", h)


@register("sketch_cm_join_size_estimate", _cm_join_oracle(), tags=("sketch", "join"))
def sketch_cm_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.sketches import count_min_table

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    cm_a = count_min_table(orders, F.col("o_custkey"))
    cm_b = count_min_table(cust, F.col("c_custkey"))
    prods = (
        cm_a.alias("a")
        .join(cm_b.alias("b"), ["d", "pos"])
        .groupBy("d")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    est = prods.agg(F.min("ip").alias("est_join_size"))
    exact = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).agg(F.count(F.lit(1)).alias("exact_join_size"))
    return est.crossJoin(exact)


# ---------------------------------------------------------------------------
# PQ-ADC top-k search — the QUERY half of IVF-PQ (emb_pq_encode is the
# storage half, emb_ivf_two_stage_ann the coarse half).  Asymmetric
# Distance Computation: a query's lookup table is its per-(subspace,
# codeword) distance row — already computed by the shared CTE chain —
# and a corpus vector's approximate distance is the SUM of table entries
# selected by its stored codes.  All integer (quantized vectors), so
# both engines rank identically.  Scale: corpus distances come from a
# broadcast-joined LUT (queries × M × K rows), never a vector-to-vector
# join; per-query top-k via rank window over corpus-sized summary.
# ---------------------------------------------------------------------------

_ADC_QUERIES = (100, 200, 300)
_ADC_K = 5


def _adc_oracle() -> str:
    from event_streaming_spark.plans.curation3 import _PQ_CTES

    qs = ", ".join(map(str, _ADC_QUERIES))
    return f"""
WITH {_PQ_CTES},
qd AS (
  SELECT vec_id AS query_vec, s, seed, dist FROM d WHERE vec_id IN ({qs})
), adc AS (
  SELECT qd.query_vec, best.vec_id AS neighbor, cast(sum(qd.dist) AS BIGINT) AS adc_dist
  FROM best JOIN qd ON qd.s = best.s AND qd.seed = best.code
  WHERE best.vec_id <> qd.query_vec
  GROUP BY 1, 2
), ranked AS (
  SELECT query_vec, neighbor, adc_dist,
         row_number() OVER (PARTITION BY query_vec ORDER BY adc_dist, neighbor) AS rn
  FROM adc
)
SELECT query_vec, neighbor, adc_dist, rn AS rank
FROM ranked WHERE rn <= {_ADC_K}
ORDER BY query_vec, rank
"""


@register("emb_pq_adc_topk", _adc_oracle(), tags=("llm", "ann"))
def emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.plans.curation3 import pq_frames

    scored, best = pq_frames(spark, sf_dir)
    # qd and codes share lineage through pq_frames, so `qd.s == codes.s`
    # written via DataFrame attributes binds both sides to the SAME
    # attribute (a trivially-true conjunct Catalyst silently drops).
    # Explicit string aliases make every conjunct bind across the join.
    qd = scored.where(F.col("vec_id").isin(*_ADC_QUERIES)).select(
        F.col("vec_id").alias("query_vec"), "s", "seed", "dist"
    ).alias("qd")
    codes = best.select("vec_id", "s", F.col("m.seed").alias("code")).alias("codes")
    adc = (
        codes.join(
            F.broadcast(qd),
            (F.col("qd.s") == F.col("codes.s")) & (F.col("qd.seed") == F.col("codes.code")),
        )
        .where(F.col("codes.vec_id") != F.col("qd.query_vec"))
        .groupBy(F.col("qd.query_vec").alias("query_vec"), F.col("codes.vec_id").alias("neighbor"))
        .agg(F.sum(F.col("qd.dist")).alias("adc_dist"))
    )
    # two-stage top-k (operators/ranks.py): per-query ADC candidates are
    # the whole code table — a bare per-query window is one task per qid.
    from event_streaming_spark.operators.ranks import topk_per_group

    return topk_per_group(
        adc, "query_vec", [F.asc("adc_dist"), F.asc("neighbor")], _ADC_K, rn_col="rank"
    ).orderBy("query_vec", "rank")


# ---------------------------------------------------------------------------
# Two-sample Welch z-test between event types' value distributions — the
# A/B-significance primitive.  Moments come from exact integer sums
# (scaled 1e6 per functions/numeric.py discipline), so mean/variance are
# bit-identical across engines; the z statistic is a fixed chain of
# IEEE ops on those identical doubles, rounded to 6.  One
# map-side-combining aggregate over the fact — no shuffle beyond the
# 5-row type summary, pairs formed by a self-join of that summary.
# ---------------------------------------------------------------------------

_ZTEST_ORACLE = """
WITH m AS (
  SELECT event_type, count(*) AS n,
         sum(cast(round(value * 1e6) AS BIGINT)) AS s1,
         sum(cast(round(value * 1e6) AS DECIMAL(19,0))
             * cast(round(value * 1e6) AS DECIMAL(19,0))) AS s2
  FROM events GROUP BY 1
), stats AS (
  SELECT event_type, n,
         (cast(s1 AS DOUBLE) / 1e6) / n AS mean,
         (cast(s2 AS DOUBLE) / 1e12 - (cast(s1 AS DOUBLE) / 1e6)
            * (cast(s1 AS DOUBLE) / 1e6) / n) / (n - 1) AS var
  FROM m
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       a.n AS n_a, b.n AS n_b,
       round(a.mean - b.mean, 6) AS mean_diff,
       round((a.mean - b.mean) / sqrt(a.var / a.n + b.var / b.n), 6) AS z_stat
FROM stats a JOIN stats b ON a.event_type < b.event_type
ORDER BY type_a, type_b
"""


@register("events_ab_value_ztest", _ZTEST_ORACLE, tags=("agg", "stats"))
def events_ab_value_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # s2 = Σq² overflows int64 at ~10⁵ rows of q ≈ 5.6e8 (ANSI error at
    # sf0.1), so the squared moment accumulates in DECIMAL(38,0) — exact
    # integers in both engines, one identical decimal→double cast at the end
    q = F.round(F.col("value") * 1e6).cast("long")
    qd = F.round(F.col("value") * 1e6).cast("decimal(19,0)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(qd * qd).alias("s2"),
    )
    stats = m.select(
        "event_type",
        "n",
        ((F.col("s1").cast("double") / 1e6) / F.col("n")).alias("mean"),
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
    a, b = stats.alias("a"), stats.alias("b")
    return (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(F.col("a.mean") - F.col("b.mean"), 6).alias("mean_diff"),
            F.round(
                (F.col("a.mean") - F.col("b.mean"))
                / F.sqrt(F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")),
                6,
            ).alias("z_stat"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Robust outlier statistics: per-type median, MAD (median absolute
# deviation) and the |dev| > 3·MAD outlier count — the robust-stats
# alternative to z-scores (one wild value cannot move the thresholds).
# Two exact-order-statistic passes (see DESIGN.md): every intermediate
# is an exact scaled integer — values at 1e6, median numerator at 1e8
# (the type-7 interpolation keeps a /100 as a NUMERATOR), deviations at
# 1e8, MAD numerator at 1e10 — so the outlier comparison
# dev·100 > 3·mad_num is pure int64 and both engines agree bitwise;
# the only divisions are the two display roundings.
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH v AS (
  SELECT event_type, cast(round(value * 1e6) AS BIGINT) AS v6 FROM events
), pos1 AS (
  SELECT event_type, v6,
         row_number() OVER (PARTITION BY event_type ORDER BY v6) AS rv,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
), med AS (
  SELECT event_type, max(n) AS n,
         max(CASE WHEN rv - 1 = ((n - 1) * 50) // 100 THEN v6 END)
           * (100 - max(((n - 1) * 50) % 100))
         + coalesce(max(CASE WHEN rv - 1 = ((n - 1) * 50) // 100 + 1 THEN v6 END),
                    max(CASE WHEN rv - 1 = ((n - 1) * 50) // 100 THEN v6 END))
           * max(((n - 1) * 50) % 100) AS med_num
  FROM pos1 GROUP BY event_type
), dev AS (
  SELECT v.event_type, abs(100 * v.v6 - m.med_num) AS d8, m.med_num, m.n
  FROM v JOIN med m USING (event_type)
), pos2 AS (
  SELECT event_type, d8, med_num,
         row_number() OVER (PARTITION BY event_type ORDER BY d8) AS rv,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type, max(med_num) AS med_num, max(n) AS n,
         max(CASE WHEN rv - 1 = ((n - 1) * 50) // 100 THEN d8 END)
           * (100 - max(((n - 1) * 50) % 100))
         + coalesce(max(CASE WHEN rv - 1 = ((n - 1) * 50) // 100 + 1 THEN d8 END),
                    max(CASE WHEN rv - 1 = ((n - 1) * 50) // 100 THEN d8 END))
           * max(((n - 1) * 50) % 100) AS mad_num
  FROM pos2 GROUP BY event_type
)
SELECT d.event_type, max(m.n) AS n,
       round(max(m.med_num) / 1e8, 6) AS med_value,
       round(max(m.mad_num) / 1e10, 6) AS mad_value,
       cast(sum(CASE WHEN d.d8 * 100 > 3 * m.mad_num THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


@register("events_mad_outliers", _MAD_ORACLE, tags=("agg", "stats", "robust"), bench=True)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and MAD from ONE rank skeleton (r12; guide §2.4 — remove
    the second range shuffle outright).

    The r11 plan ranked the corpus twice: once on the value for the
    median, then again on the derived deviation |100·v − med| for the
    MAD — two full range-partitioned order-statistic passes.  But the
    deviation's order statistics are recoverable from the VALUE
    skeleton: deviations over rank order form a (weak) V around the
    median, so the j+1 elements closest to the median are a contiguous
    rank window whose max deviation sits at an endpoint — the (j+1)-th
    smallest deviation is exactly

        d_(j) = min over i of max(|100·v_i − med|, |100·v_{i+j} − med|)

    (any j+1 elements have max ≥ d_(j); the contiguous run of
    deviations ≤ d_(j) yields a window achieving it).  So the MAD's two
    interpolation values come from ONE shifted self-join on the pinned
    skeleton instead of a second bucketize+offsets+window pass, and the
    events table is scanned exactly once (inside the skeleton's range
    shuffle) — every later consumer reads the checkpoint."""
    from event_streaming_spark.operators.materialize import materialize
    from event_streaming_spark.operators.ranks import with_group_rank

    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 1e6).cast("long").alias("v6")
    )
    # per-group rank via the range-partitioned global-rn skeleton — a
    # PARTITION BY event_type sort window would put each type's ENTIRE
    # value set through one task (the low-cardinality trap; see
    # operators/ranks.py:with_group_rank).  Pinned once: FOUR consumers
    # below (median agg, both self-join sides, the outlier count).
    pos = materialize(with_group_rank(v, "event_type", "v6"), "mad-ranked")

    lo = F.max(F.when(F.expr("rv - 1 = ((n - 1) * 50) div 100"), F.col("v6")))
    hi = F.max(F.when(F.expr("rv - 1 = ((n - 1) * 50) div 100 + 1"), F.col("v6")))
    f_ = F.max(F.expr("((n - 1) * 50) % 100"))
    med = pos.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (lo * (100 - f_) + F.coalesce(hi, lo) * f_).alias("med_num"),
    )

    # type-7 p50 of the deviations needs positions k1 and k1+1
    # (0-indexed); each left row probes both window shifts.
    meta = med.select(
        "event_type",
        "med_num",
        F.expr("((n - 1) * 50) div 100").alias("k1"),
    )
    left = (
        pos.join(meta, "event_type")
        .select(
            "event_type",
            "rv",
            "k1",
            F.abs(100 * F.col("v6") - F.col("med_num")).alias("d_i"),
            F.col("med_num"),
            F.explode(F.array(F.col("k1"), F.col("k1") + 1)).alias("s"),
        )
    )
    right = pos.select(
        F.col("event_type").alias("et2"),
        F.col("rv").alias("rv2"),
        F.col("v6").alias("v62"),
    )
    win = left.join(
        right,
        (F.col("event_type") == F.col("et2"))
        & (F.col("rv2") == F.col("rv") + F.col("s")),
    ).select(
        "event_type",
        (F.col("s") == F.col("k1")).alias("is_lo"),
        F.greatest(
            F.col("d_i"), F.abs(100 * F.col("v62") - F.col("med_num"))
        ).alias("w"),
    )
    dstat = win.groupBy("event_type").agg(
        F.min(F.when(F.col("is_lo"), F.col("w"))).alias("mad_lo"),
        F.min(F.when(~F.col("is_lo"), F.col("w"))).alias("mad_hi"),
    )
    mad = med.join(dstat, "event_type").select(
        "event_type",
        "med_num",
        (
            F.col("mad_lo") * (100 - F.expr("((n - 1) * 50) % 100"))
            + F.coalesce("mad_hi", "mad_lo") * F.expr("((n - 1) * 50) % 100")
        ).alias("mad_num"),
    )
    return (
        pos.join(mad, "event_type")
        .select(
            "event_type",
            F.abs(100 * F.col("v6") - F.col("med_num")).alias("d8"),
            "med_num",
            "mad_num",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med_num") / 1e8, 6).alias("med_value"),
            F.round(F.max("mad_num") / 1e10, 6).alias("mad_value"),
            F.sum(
                F.when(F.col("d8") * 100 > 3 * F.col("mad_num"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Bigram-conditional surprisal (perplexity proxy v2): per-token score
# log2 cnt(prev) − log2 cnt(prev,tok) — how UNPREDICTABLE each token is
# given its predecessor under the corpus-trained bigram model; document
# average ranks fluent text low and gibberish/boilerplate-stitched text
# high, sharper than the unigram scorer (text_unigram_surprisal_score).
# First tokens back off to the unigram model.  Integer log2 via
# bit-length (length(bin(c))-1) keeps both engines bit-identical, the
# same trick as the unigram query.  Scale: positions are a stateless
# explode; ONE bigram count shuffle + ONE join back on the bigram key;
# count tables scale with the corpus, so their join strategy is left to
# stats/AQE (never a forced broadcast of a data-scaling build side).
# ---------------------------------------------------------------------------


def _bigram_oracle() -> str:
    from event_streaming_spark.functions.hashing import sql_normalize_text

    norm = sql_normalize_text("text")
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(range(1, len(string_split({norm}, ' ')) + 1)) AS pos,
         unnest(string_split({norm}, ' ')) AS tok
  FROM documents
), seq AS (
  SELECT doc_id, pos, tok,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM toks
), cu AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c) AS t FROM cu),
cb AS (SELECT prev, tok, count(*) AS b FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
scored AS (
  SELECT s.doc_id,
         CASE WHEN s.prev IS NULL
              THEN (length(bin(tot.t)) - 1) - (length(bin(u.c)) - 1)
              ELSE (length(bin(pu.c)) - 1) - (length(bin(cb.b)) - 1)
         END AS surprisal
  FROM seq s
  JOIN cu u ON u.tok = s.tok
  LEFT JOIN cu pu ON pu.tok = s.prev
  LEFT JOIN cb ON cb.prev = s.prev AND cb.tok = s.tok
  CROSS JOIN tot
)
SELECT doc_id,
       cast(count(*) AS BIGINT) AS n_tokens,
       cast(sum(surprisal) AS BIGINT) AS sum_surprisal,
       round(cast(sum(surprisal) AS DOUBLE) / count(*), 6) AS avg_surprisal
FROM scored GROUP BY doc_id
ORDER BY doc_id
"""


@register("text_bigram_surprisal_score", _bigram_oracle(), tags=("llm", "text", "quality"))
def text_bigram_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from event_streaming_spark.functions.hashing import tokens
    from event_streaming_spark.plans.catalog import spread

    def ilog2(c):
        return F.length(F.bin(c)) - 1

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )
    seq = toks.withColumn(
        "prev", F.lag("tok").over(Window.partitionBy("doc_id").orderBy("pos"))
    )
    cu = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = cu.agg(F.sum("c").alias("t"))
    cb = (
        seq.where(F.col("prev").isNotNull())
        .groupBy("prev", "tok")
        .agg(F.count(F.lit(1)).alias("b"))
    )
    # cu (unigram) and cb (bigram) counts scale with the corpus — at
    # 100 TB the distinct-bigram table is billions of rows, so forcing
    # them to the broadcast side would OOM every executor.  Leave the
    # strategy to stats/AQE: the shuffled join on tok / (prev, tok) is
    # the scale plan.  Only the 1-row grand total keeps its hint.
    scored = (
        seq.join(cu, "tok")
        .join(
            cu.select(F.col("tok").alias("prev"), F.col("c").alias("pc")),
            "prev",
            "left",
        )
        .join(cb, ["prev", "tok"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.when(
                F.col("prev").isNull(), ilog2(F.col("t")) - ilog2(F.col("c"))
            )
            .otherwise(ilog2(F.col("pc")) - ilog2(F.col("b")))
            .alias("surprisal"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("surprisal").cast("long").alias("sum_surprisal"),
            F.round(F.sum("surprisal").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_surprisal"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle: each training epoch orders the corpus by
# stable_hash32("ep<k>|" + doc_id) — a different pseudo-random
# permutation per epoch that any run, any partitioning, any engine
# reproduces exactly (data-order reproducibility is a training-run
# debugging requirement; random() shuffles can't replay).  Emitted as a
# manifest head per epoch.  Scale: the permutation key is a stateless
# projection; the global order materializes only when a consumer sorts
# its shard — here LIMITed for the oracle.
# ---------------------------------------------------------------------------


def _epoch_oracle() -> str:
    from event_streaming_spark.functions.hashing import sql_stable_hash32

    parts = []
    for ep in (1, 2):
        h = sql_stable_hash32(f"'ep{ep}|' || cast(doc_id AS VARCHAR)")
        parts.append(f"""
SELECT {ep} AS epoch, doc_id,
       row_number() OVER (ORDER BY {h}, doc_id) AS position
FROM documents
ORDER BY position LIMIT 50
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts) + " ORDER BY epoch, position"


@register("docs_epoch_shuffle_manifest", _epoch_oracle(), tags=("llm", "sample", "order"))
def docs_epoch_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.hashing import stable_hash32
    from event_streaming_spark.operators.ranks import with_global_row_number

    docs = load(spark, sf_dir, "documents").select("doc_id")
    out = None
    for ep in (1, 2):
        h = stable_hash32(F.concat(F.lit(f"ep{ep}|"), F.col("doc_id").cast("string")))
        # range-partitioned global row number (operators/ranks.py) — a
        # bare Window.orderBy would sort the corpus on ONE partition
        ranked, _n = with_global_row_number(
            docs.withColumn("__h", h), [F.asc("__h"), F.asc("doc_id")], "position"
        )
        ranked = ranked.where(F.col("position") <= 50).select(
            F.lit(ep).alias("epoch"), "doc_id", F.col("position").cast("int").alias("position")
        )
        out = ranked if out is None else out.union(ranked)
    return out.orderBy("epoch", "position")


# ---------------------------------------------------------------------------
# Combined IVF-PQ search — the full production ANN stack in one query:
# coarse quantizer (per-label centroids, nprobe=3 — emb_ivf_two_stage_ann's
# stage 1) narrows to ~nprobe/n_cells of the corpus, then PQ-ADC integer
# distances (emb_pq_adc_topk's stage 2) rank ONLY within the probed
# cells.  At 100 TB this is the shape that works: the corpus is touched
# cell-wise (partition pruning by cell id), scored from codes (32× small-
# er than raw vectors), and never joined vector-to-vector.
# ---------------------------------------------------------------------------


def _ivfpq_oracle() -> str:
    from event_streaming_spark.plans.curation3 import _PQ_CTES

    qs = ", ".join(map(str, _ADC_QUERIES))
    return f"""
WITH {_PQ_CTES},
cent AS (
  SELECT label, list(c ORDER BY dim) AS centroid FROM (
    SELECT label, dd AS dim,
           cast(round(cast(sum(cast(embedding[dd + 1] as decimal(30,10))) as double)
                      / count(*), 6) as double) AS c
    FROM embeddings, range(64) t(dd)
    GROUP BY label, dd
  ) GROUP BY label
), qrows AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id IN ({qs})
), cellprobe AS (
  SELECT qid, label FROM (
    SELECT qrows.qid, cent.label,
           row_number() OVER (
             PARTITION BY qrows.qid
             ORDER BY round(list_dot_product(qrows.qv::DOUBLE[], cent.centroid) /
                   (sqrt(list_dot_product(qrows.qv::DOUBLE[], qrows.qv::DOUBLE[])) *
                    sqrt(list_dot_product(cent.centroid, cent.centroid))), 6) DESC,
               cent.label) AS cell_rank
    FROM qrows, cent
  ) WHERE cell_rank <= 3
), qd AS (
  SELECT vec_id AS qid, s, seed, dist FROM d WHERE vec_id IN ({qs})
), adc AS (
  SELECT qd.qid, best.vec_id AS neighbor, cast(sum(qd.dist) AS BIGINT) AS adc_dist
  FROM best
  JOIN embeddings emb ON emb.vec_id = best.vec_id
  JOIN qd ON qd.s = best.s AND qd.seed = best.code
  JOIN cellprobe ON cellprobe.qid = qd.qid AND cellprobe.label = emb.label
  WHERE best.vec_id <> qd.qid
  GROUP BY 1, 2
)
SELECT qid, neighbor, adc_dist, rn AS rank FROM (
  SELECT qid, neighbor, adc_dist,
         row_number() OVER (PARTITION BY qid ORDER BY adc_dist, neighbor) AS rn
  FROM adc
) WHERE rn <= {_ADC_K}
ORDER BY qid, rank
"""


@register("emb_ivf_pq_search", _ivfpq_oracle(), tags=("llm", "ann", "ivf"), bench=True)
def emb_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # wcell: K-centroid ranking (bounded)

    from event_streaming_spark.functions.numeric import cosine
    from event_streaming_spark.plans.curation3 import pq_frames

    emb = load(spark, sf_dir, "embeddings")
    # coarse quantizer (shared shape with emb_ivf_two_stage_ann)
    exploded = emb.select("label", F.posexplode("embedding").alias("dim", "x"))
    cent = (
        exploded.groupBy("label", "dim")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(30,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s.c
            ).alias("centroid")
        )
    )
    qrows = emb.filter(F.col("vec_id").isin(*_ADC_QUERIES)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    wcell = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("label"))
    probe = (
        qrows.crossJoin(F.broadcast(cent))
        .select("qid", "label", F.round(cosine(F.col("qv"), F.col("centroid")), 6).alias("csim"))
        .withColumn("cell_rank", F.row_number().over(wcell))
        .filter(F.col("cell_rank") <= 3)
        .select("qid", "label")
    )
    # fine ranking: ADC over codes, restricted to probed cells
    scored, best = pq_frames(spark, sf_dir)
    # Same shared-lineage hazard as emb_pq_adc_topk: alias every side and
    # bind join conjuncts by alias so none resolves trivially true.
    qd = scored.where(F.col("vec_id").isin(*_ADC_QUERIES)).select(
        F.col("vec_id").alias("qid"), "s", "seed", "dist"
    ).alias("qd")
    codes = best.select("vec_id", "s", F.col("m.seed").alias("code")).join(
        emb.select("vec_id", "label"), "vec_id"
    ).alias("codes")
    probe = probe.alias("probe")
    adc = (
        codes.join(
            F.broadcast(qd),
            (F.col("qd.s") == F.col("codes.s")) & (F.col("qd.seed") == F.col("codes.code")),
        )
        .join(
            F.broadcast(probe),
            (F.col("probe.qid") == F.col("qd.qid"))
            & (F.col("probe.label") == F.col("codes.label")),
        )
        .where(F.col("codes.vec_id") != F.col("qd.qid"))
        .groupBy(F.col("qd.qid").alias("qid"), F.col("codes.vec_id").alias("neighbor"))
        .agg(F.sum(F.col("qd.dist")).alias("adc_dist"))
    )
    # two-stage top-k (operators/ranks.py): probed-cell candidates still
    # scale with cell population — never one task per qid.
    from event_streaming_spark.operators.ranks import topk_per_group

    return topk_per_group(
        adc, "qid", [F.asc("adc_dist"), F.asc("neighbor")], _ADC_K, rn_col="rank"
    ).orderBy("qid", "rank")


# ---------------------------------------------------------------------------
# IVF-PQ end-to-end recall audit: the combined system's top-5 vs the
# exact cosine top-5 for the same queries — the ONE number you tune
# nprobe / subspace count against.  Captures BOTH loss sources (coarse
# cells pruning the true neighbor's cell; PQ distortion reordering
# within cells).  Same self-audit discipline as emb_lsh_recall_audit.
# ---------------------------------------------------------------------------


def _ivfpq_recall_oracle() -> str:
    qs = ", ".join(map(str, _ADC_QUERIES))
    return f"""
WITH exact AS (
  SELECT qid, neighbor FROM (
    SELECT q.vec_id AS qid, e.vec_id AS neighbor,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) DESC,
               e.vec_id) AS rn
    FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
    WHERE q.vec_id IN ({qs})
  ) WHERE rn <= {_ADC_K}
), approx AS (
  SELECT qid, neighbor FROM ({_ivfpq_oracle()})
)
SELECT exact.qid, count(approx.neighbor) AS n_hit,
       round(count(approx.neighbor) / {float(_ADC_K)}, 6) AS recall_at_5
FROM exact LEFT JOIN approx
  ON exact.qid = approx.qid AND exact.neighbor = approx.neighbor
GROUP BY exact.qid
ORDER BY exact.qid
"""


@register("emb_ivf_pq_recall_audit", _ivfpq_recall_oracle(), tags=("llm", "ann", "audit"))
def emb_ivf_pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.numeric import cosine

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(*_ADC_QUERIES)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    from event_streaming_spark.operators.ranks import topk_per_group

    scored = (
        emb.alias("e")
        .crossJoin(F.broadcast(q))
        .where(F.col("e.vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("e.vec_id").alias("neighbor"),
            F.round(cosine(F.col("qv"), F.col("e.embedding")), 6).alias("cs"),
        )
    )
    # two-stage top-k (operators/ranks.py): the exact arm scores the
    # whole corpus per qid — never one task per qid.
    exact = topk_per_group(
        scored, "qid", [F.desc("cs"), F.asc("neighbor")], _ADC_K
    ).select("qid", "neighbor")
    approx = emb_ivf_pq_search(spark, sf_dir).select(
        F.col("qid").alias("a_qid"), F.col("neighbor").alias("a_nid")
    )
    return (
        exact.join(
            approx,
            (exact.qid == F.col("a_qid")) & (exact.neighbor == F.col("a_nid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("a_nid").alias("n_hit"),
            F.round(F.count("a_nid") / float(_ADC_K), 6).alias("recall_at_5"),
        )
        .orderBy("qid")
    )

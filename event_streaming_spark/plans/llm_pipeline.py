"""Pipeline-hygiene operators for LLM training data (SURVEY §2.5 extension):
data-quality constraint reporting, sub-document (passage) dedup, and
train/test contamination checking.

These are the operators a 100 TB curation pipeline runs between ingest
and training — all pure relational plans, all oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import sql_normalize_text
from event_streaming_spark.plans.catalog import load, register, spread

# ---------------------------------------------------------------------------
# Data-quality constraint report: null rates, range violations, referential
# integrity — one row per constraint.  Scale: each constraint is a
# map-side count over one scan; the FK check is a broadcast anti-join.
# ---------------------------------------------------------------------------

_QUALITY_ORACLE = """
SELECT 'orders.custkey_fk_violations' AS constraint_name,
       (SELECT count(*) FROM orders o
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS violations
UNION ALL
SELECT 'lineitem.qty_range_1_50',
       (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
UNION ALL
SELECT 'lineitem.discount_range_0_01',
       (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1)
UNION ALL
SELECT 'events.null_event_type',
       (SELECT count(*) FROM events WHERE event_type IS NULL)
UNION ALL
SELECT 'events.value_nonpositive',
       (SELECT count(*) FROM events WHERE value <= 0)
UNION ALL
SELECT 'documents.empty_text',
       (SELECT count(*) FROM documents WHERE len(trim(text)) = 0)
"""


@register("quality_constraint_report", _QUALITY_ORACLE, tags=("llm", "quality"))
def quality_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")
    docs = load(spark, sf_dir, "documents")

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("violations")).select(
            F.lit(name).alias("constraint_name"), "violations"
        )

    fk = orders.join(
        cust.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    checks = [
        count_row("orders.custkey_fk_violations", fk),
        count_row(
            "lineitem.qty_range_1_50",
            li.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
        ),
        count_row(
            "lineitem.discount_range_0_01",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        ),
        count_row("events.null_event_type", ev.filter(F.col("event_type").isNull())),
        count_row("events.value_nonpositive", ev.filter(F.col("value") <= 0)),
        count_row(
            "documents.empty_text",
            docs.filter(F.length(F.trim(F.col("text"))) == 0),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# ---------------------------------------------------------------------------
# Sub-document dedup: PASSAGE-level exact duplication across the corpus —
# the boilerplate-removal pass (repeated passages across docs are
# navigation chrome / licenses / templates).  Passages = non-overlapping
# 10-token windows (the fixtures carry no sentence punctuation; on real
# prose, split on sentence boundaries first).  Scale: explode to
# passages, hash, one shuffle on the hash; emit only cross-doc repeats.
# ---------------------------------------------------------------------------

_PASSAGE_W = 10

_PASSAGE_SQL = (
    "list_transform(generate_series(1, greatest(cast(floor(len(__toks) / {w}.0) as bigint), 0)),"
    " i -> array_to_string((__toks)[(i-1)*{w}+1:i*{w}], ' '))"
).format(w=_PASSAGE_W)

_SENT_ORACLE = f"""
WITH passages AS (
  SELECT doc_id, unnest({_PASSAGE_SQL}) AS passage
  FROM (SELECT doc_id, string_split({sql_normalize_text('text')}, ' ') AS __toks
        FROM documents)
)
SELECT md5(passage) AS passage_hash,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS first_doc_id
FROM passages
GROUP BY md5(passage)
HAVING count(DISTINCT doc_id) >= 2
"""


@register("passage_cross_doc_dedup", _SENT_ORACLE, tags=("llm", "dedup", "text"))
def passage_cross_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.hashing import tokens

    docs = spread(load(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    n_pass = F.floor(F.size(toks) / F.lit(_PASSAGE_W)).cast("int")
    idx = F.sequence(F.lit(1), F.greatest(n_pass, F.lit(0)))
    passages = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.array_join(
                    F.slice(toks, (i - 1) * _PASSAGE_W + 1, _PASSAGE_W), " "
                ),
            )
        ).alias("passage"),
    )
    return (
        passages.groupBy(F.md5("passage").alias("passage_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Train/test contamination check: which corpus documents share long (5-token)
# shingles with a benchmark set (here: doc_id < 10 stands in for the eval
# set).  Scale: the benchmark shingle set is tiny → broadcast semi-join
# against the exploded corpus shingles; the corpus is scanned once, never
# shuffled.  This is the decontamination pass every training pipeline runs.
# ---------------------------------------------------------------------------

_CONTAM_K = 5

_CONTAM_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(string_split({norm}, ' ')) - {km1}, 0)),"
    " i -> array_to_string((string_split({norm}, ' '))[i:i+{km1}], ' ')))"
).format(norm=sql_normalize_text("text"), km1=_CONTAM_K - 1)

_CONTAM_ORACLE = f"""
WITH bench AS (
  SELECT DISTINCT unnest({_CONTAM_SHINGLES}) AS shingle
  FROM documents WHERE doc_id < 10
), corpus AS (
  SELECT doc_id, unnest({_CONTAM_SHINGLES}) AS shingle
  FROM documents WHERE doc_id >= 10
)
SELECT corpus.doc_id AS doc_id,
       count(*) AS n_contaminated_shingles
FROM corpus JOIN bench USING (shingle)
GROUP BY corpus.doc_id
"""


@register("contamination_check_vs_benchmark", _CONTAM_ORACLE, tags=("llm", "dedup", "text"))
def contamination_check_vs_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.hashing import shingles

    docs = spread(load(spark, sf_dir, "documents"))
    sh = docs.select("doc_id", F.explode(shingles(F.col("text"), _CONTAM_K)).alias("shingle"))
    bench = (
        sh.filter(F.col("doc_id") < 10).select("shingle").distinct()
    )
    corpus = sh.filter(F.col("doc_id") >= 10)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )

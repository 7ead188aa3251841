"""Corpus-hygiene tranche 2: PII scanning/redaction, repetition metrics,
and deterministic context packing — the remaining table-stakes passes of
a training-data pipeline (north-star scope beyond the C reference, like
plans/curation.py).

Scale notes inline; the common theme: every pass is either a stateless
projection (PII scan — pipelines into the scan, no shuffle) or the
canonical wordcount shape (repetition — explode + two keyed aggs with
map-side combine), except packing, which needs a GLOBAL prefix sum and
uses the distributed primitive in ``operators/ranks.py`` instead of a
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import normalize_text, sql_normalize_text
from event_streaming_spark.plans.catalog import load, register, spread

# ---------------------------------------------------------------------------
# PII scan + redaction.  Conservative patterns shared verbatim by both
# engines (constructs chosen to behave identically in Java regex and
# RE2): email, US-style dashed/dotted phone, SSN-shaped id.
# Stateless projection — no shuffle; at 100 TB this runs at scan speed.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}",
    "ssn_like": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}

_PII_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_PATTERNS["email"]}')) AS n_emails,
       len(regexp_extract_all(text, '{PII_PATTERNS["phone"]}')) AS n_phones,
       len(regexp_extract_all(text, '{PII_PATTERNS["ssn_like"]}')) AS n_ssn_like,
       (len(regexp_extract_all(text, '{PII_PATTERNS["email"]}')) > 0
        OR len(regexp_extract_all(text, '{PII_PATTERNS["phone"]}')) > 0) AS has_pii,
       substr(regexp_replace(regexp_replace(text,
                 '{PII_PATTERNS["email"]}', '[EMAIL]', 'g'),
                 '{PII_PATTERNS["phone"]}', '[PHONE]', 'g'), 1, 80) AS redacted_head
FROM documents
"""


@register("text_pii_scan", _PII_ORACLE, tags=("llm", "text", "quality"))
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII hit counts + a redacted preview.

    Redaction order matters (emails first, then phones) and is identical
    in both engines; ssn_like is counted but not redacted separately —
    the phone pattern does not subsume it (different separators)."""
    docs = spread(load(spark, sf_dir, "documents"))
    n = {
        k: F.size(F.regexp_extract_all(F.col("text"), F.lit(p), F.lit(0)))
        for k, p in PII_PATTERNS.items()
    }
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), PII_PATTERNS["email"], "[EMAIL]"),
        PII_PATTERNS["phone"],
        "[PHONE]",
    )
    return docs.select(
        "doc_id",
        n["email"].alias("n_emails"),
        n["phone"].alias("n_phones"),
        n["ssn_like"].alias("n_ssn_like"),
        ((n["email"] > 0) | (n["phone"] > 0)).alias("has_pii"),
        F.substring(redacted, 1, 80).alias("redacted_head"),
    )


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher/RefinedWeb-style quality rules): distinct
# token ratio + most-frequent-token mass per document.  The canonical
# wordcount shape: explode → (doc, token) partial-agg → doc agg.  Both
# shuffles combine map-side; at 100 TB the (doc, token) key is near-unique
# so the first shuffle moves ~|tokens| rows once.
# ---------------------------------------------------------------------------

_TOKS = f"string_split({sql_normalize_text('text')}, ' ')"

_REP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), counts AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
)
SELECT doc_id,
       cast(sum(c) as bigint) AS n_tokens,
       cast(count(*) as bigint) AS n_distinct,
       round(cast(count(*) as double) / sum(c), 6) AS distinct_ratio,
       round(cast(max(c) as double) / sum(c), 6) AS top_token_frac
FROM counts GROUP BY doc_id
"""


@register("text_repetition_metrics", _REP_ORACLE, tags=("llm", "text", "quality"))
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias("distinct_ratio"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_token_frac"),
    )


# ---------------------------------------------------------------------------
# Deterministic context packing: concatenate documents in corpus order
# (doc_id) and chunk into fixed context windows — the standard LM
# training layout.  Each doc's global token offset is a prefix sum under
# a total order: computed with the distributed global-cumsum primitive
# (range buckets + driver offsets), NOT a single-partition window.
# ---------------------------------------------------------------------------

PACK_CONTEXT_TOKENS = 2048

_PACK_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, cast(len({_TOKS}) as bigint) AS n_tokens FROM documents
), pos AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM sized
)
SELECT doc_id, n_tokens,
       cast(cum - n_tokens as bigint) AS start_offset,
       cast((cum - n_tokens) // {PACK_CONTEXT_TOKENS} as bigint) AS pack_id,
       ((cum - 1) // {PACK_CONTEXT_TOKENS}) > ((cum - n_tokens) // {PACK_CONTEXT_TOKENS})
         AS spans_boundary
FROM pos
"""


@register("docs_pack_into_contexts", _PACK_ORACLE, tags=("llm", "sample", "pipeline"))
def docs_pack_into_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import with_global_cumsum

    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(normalize_text(F.col("text")), " ")).cast("long").alias("n_tokens"),
    )
    packed, _total = with_global_cumsum(sized, [F.asc("doc_id")], "n_tokens", "cum")
    start = F.col("cum") - F.col("n_tokens")
    ctx = F.lit(PACK_CONTEXT_TOKENS)
    return packed.select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / ctx).cast("long").alias("pack_id"),
        (F.floor((F.col("cum") - 1) / ctx) > F.floor(start / ctx)).alias("spans_boundary"),
    )

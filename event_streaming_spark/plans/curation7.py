"""Round-11 curation analytics: eval-set decontamination, the quality
filter funnel, and CCNet-style perplexity buckets.

* ``docs_eval_decontamination_manifest`` — the decontamination pass
  every training pipeline runs before a model ships (GPT-3 appendix C /
  Llama-2 style): two deterministic held-out eval sets are carved from
  the corpus, corpus documents sharing >= ``_DECON_MIN`` distinct
  ``_DECON_K``-token shingles with an eval set are flagged, and the
  output is the per-(source, eval_set) attrition manifest — corpus
  docs, flagged docs, flagged tokens, flagged ppm — including explicit
  zero rows so a clean source is visible as clean.
* ``docs_quality_filter_funnel`` — the RefinedWeb/FineWeb-style
  CUMULATIVE gate attrition table: one row per pipeline stage (all →
  min-words → mean-word-length → alpha-ratio → stopwords →
  repetition), each with surviving docs, surviving tokens, and kept
  ppm vs the raw corpus.  The per-stage drop is what a curation run
  reports; the single-pass gate flags are the same integer-exact ppm
  tests as ``docs_gopher_quality_flags``.
* ``docs_ccnet_perplexity_buckets`` — CCNet's head/middle/tail split:
  per source, documents are ranked by the SAME per-doc add-1 bigram
  cross-entropy h as ``docs_perplexity_filter_curve`` (shared
  ``ppl_perdoc`` / ``PPL_CORE_CTES`` definition) and cut into terciles
  with ntile(3); buckets report docs, bigram tokens, and exact-decimal
  mean h.

100 TB shape: decontamination is the canonical broadcast-semi-join —
the eval-set shingle table is bounded by the (tiny) eval fraction, so
the corpus is scanned once and never shuffled; the funnel is one
tokenize pass + a single 1-row aggregate unpivoted to 6 stage rows;
the buckets ride the shared perplexity model (vocab-bounded) plus one
source-partitioned window over the doc-sized perdoc frame.

Reference parity note: the reference engine has no text surface
(SURVEY §2); these extend the curation pack (plans/curation*.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import (
    shingles,
    sql_normalize_text,
    tokens,
)
from event_streaming_spark.operators.materialize import materialize
from event_streaming_spark.plans.catalog import load, register, spread
from event_streaming_spark.plans.curation6 import PPL_CORE_CTES, ppl_perdoc

# ---------------------------------------------------------------------------
# Eval-set decontamination manifest.
# ---------------------------------------------------------------------------

_DECON_K = 5  # shingle width (tokens) — long enough to be evidential
_DECON_MIN = 2  # flag a doc at >= this many distinct shared shingles
_DECON_MOD = 17  # eval carve-out: doc_id % 17 == 0 -> dev, == 5 -> test

_DECON_SH_SQL = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(ws) - {km1}, 0)),"
    " i -> array_to_string(ws[i:i+{km1}], ' ')))"
).format(km1=_DECON_K - 1)

_DECON_ORACLE = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, source, cast(len(ws) AS BIGINT) AS n_words,
         {_DECON_SH_SQL} AS sh
  FROM (SELECT doc_id, source,
               string_split({sql_normalize_text('text')}, ' ') AS ws
        FROM documents)
), ev AS MATERIALIZED (
  SELECT DISTINCT
         CASE WHEN doc_id % {_DECON_MOD} = 0 THEN 'dev' ELSE 'test' END
           AS eval_set,
         unnest(sh) AS s
  FROM base WHERE doc_id % {_DECON_MOD} IN (0, 5)
), corp AS MATERIALIZED (
  SELECT doc_id, unnest(sh) AS s
  FROM base WHERE doc_id % {_DECON_MOD} NOT IN (0, 5)
), flagged AS (
  SELECT doc_id, eval_set FROM (
    SELECT c.doc_id, e.eval_set, cast(count(*) AS BIGINT) AS k
    FROM corp c JOIN ev e ON e.s = c.s
    GROUP BY c.doc_id, e.eval_set
  ) WHERE k >= {_DECON_MIN}
), srctot AS (
  SELECT source, cast(count(*) AS BIGINT) AS n_corpus_docs
  FROM base WHERE doc_id % {_DECON_MOD} NOT IN (0, 5) GROUP BY source
), fl AS (
  SELECT b.source, f.eval_set,
         cast(count(*) AS BIGINT) AS n_flagged_docs,
         cast(sum(b.n_words) AS BIGINT) AS flagged_tokens
  FROM flagged f JOIN base b ON b.doc_id = f.doc_id
  GROUP BY b.source, f.eval_set
)
SELECT g.source, g.eval_set, g.n_corpus_docs,
       coalesce(fl.n_flagged_docs, 0) AS n_flagged_docs,
       coalesce(fl.flagged_tokens, 0) AS flagged_tokens,
       cast(coalesce(fl.n_flagged_docs, 0) * 1000000 // g.n_corpus_docs
            AS BIGINT) AS flagged_ppm
FROM (SELECT source, n_corpus_docs, eval_set
      FROM srctot CROSS JOIN (VALUES ('dev'), ('test')) e(eval_set)) g
LEFT JOIN fl ON fl.source = g.source AND fl.eval_set = g.eval_set
ORDER BY g.source, g.eval_set
"""


@register(
    "docs_eval_decontamination_manifest",
    _DECON_ORACLE,
    tags=("llm", "dedup", "curation", "audit"),
    bench=True,
)
def docs_eval_decontamination_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-(source, eval_set) decontamination attrition manifest.

    Scale design: the eval-set shingle table is bounded by the eval
    carve-out fraction, so it BROADCASTS; the corpus shingle stream is
    scanned once, joined map-side, and reduced by (doc, eval_set) —
    the corpus itself is never shuffled.  The flag threshold
    (>= _DECON_MIN distinct shared _DECON_K-shingles) is an integer
    count; zero rows come from the (source x eval_set) grid so a clean
    source appears explicitly with flagged_ppm = 0.
    """
    docs = spread(load(spark, sf_dir, "documents"))
    # base feeds FOUR branches (eval shingles, corpus shingles, source
    # totals, flagged-doc meta): without a pin the tokenize+shingle
    # pass re-runs once per branch (the multi-branch re-scan gotcha —
    # 79.7 s -> materialized single pass at 10x).
    base = materialize(
        docs.select(
            "doc_id",
            "source",
            F.size(tokens(F.col("text"))).cast("long").alias("n_words"),
            shingles(F.col("text"), _DECON_K).alias("sh"),
        ),
        name="decon-base",
    )
    in_eval = F.pmod(F.col("doc_id"), F.lit(_DECON_MOD)).isin(0, 5)
    ev = (
        base.where(in_eval)
        .select(
            F.when(F.pmod(F.col("doc_id"), F.lit(_DECON_MOD)) == 0, "dev")
            .otherwise("test")
            .alias("eval_set"),
            F.explode("sh").alias("s"),
        )
        .distinct()
    )
    corp_docs = base.where(~in_eval)
    corp = corp_docs.select("doc_id", F.explode("sh").alias("s"))
    flagged = (
        corp.join(F.broadcast(ev), "s")
        .groupBy("doc_id", "eval_set")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        .where(F.col("k") >= _DECON_MIN)
        .select("doc_id", "eval_set")
    )
    srctot = corp_docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus_docs")
    )
    fl = (
        flagged.join(corp_docs.select("doc_id", "source", "n_words"), "doc_id")
        .groupBy("source", "eval_set")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_flagged_docs"),
            F.sum("n_words").cast("long").alias("flagged_tokens"),
        )
    )
    grid = srctot.select(
        "source",
        "n_corpus_docs",
        F.explode(F.array(F.lit("dev"), F.lit("test"))).alias("eval_set"),
    )
    return (
        grid.join(fl, ["source", "eval_set"], "left")
        .select(
            "source",
            "eval_set",
            "n_corpus_docs",
            F.coalesce("n_flagged_docs", F.lit(0)).cast("long").alias(
                "n_flagged_docs"
            ),
            F.coalesce("flagged_tokens", F.lit(0)).cast("long").alias(
                "flagged_tokens"
            ),
            F.expr(
                "coalesce(n_flagged_docs, 0) * CAST(1000000 AS BIGINT)"
                " div n_corpus_docs"
            )
            .cast("long")
            .alias("flagged_ppm"),
        )
        .orderBy("source", "eval_set")
    )


# ---------------------------------------------------------------------------
# Quality filter funnel.
# ---------------------------------------------------------------------------

_FUN_STOP = ("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")
_FUN_MIN_WORDS, _FUN_MAX_WORDS = 20, 100_000
_FUN_MWL_LO, _FUN_MWL_HI = 4_300_000, 12_000_000  # mean word length, µ-chars
_FUN_ALPHA_MIN = 700_000  # ppm of words containing a letter
_FUN_STOP_MIN = 2  # distinct stopwords required
_FUN_DUP2_MAX = 80_000  # ppm of repeated (non-first-occurrence) 2-grams

_FUN_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in _FUN_STOP) + "]"

_FUN_STAGES = (
    "0_all",
    "1_min_words",
    "2_mean_word_len",
    "3_alpha_ratio",
    "4_stopwords",
    "5_repetition",
)


def _funnel_oracle() -> str:
    d2 = (
        "len(list_distinct(list_transform("
        "generate_series(1, greatest(len(ws) - 1, 0)),"
        " i -> array_to_string(ws[i:i+1], ' '))))"
    )
    stage_rows = "\nUNION ALL\n".join(
        f"SELECT '{s}' AS stage, d{i} AS n_docs, t{i} AS n_tokens,"
        f" cast(d{i} * 1000000 // d0 AS BIGINT) AS kept_ppm FROM agg"
        for i, s in enumerate(_FUN_STAGES)
    )
    return f"""
WITH f AS MATERIALIZED (
  SELECT cast(len(ws) AS BIGINT) AS nw,
         cast(list_aggregate(list_transform(ws, w -> length(w)), 'sum')
              AS BIGINT) AS nc,
         cast(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
              AS BIGINT) AS na,
         cast(len(list_filter({_FUN_STOP_SQL},
                              s -> list_contains(ws, s))) AS BIGINT) AS ns,
         cast(len(ws) - 1 AS BIGINT) AS n2,
         cast({d2} AS BIGINT) AS d2
  FROM (SELECT string_split({sql_normalize_text('text')}, ' ') AS ws
        FROM documents)
), g AS (
  SELECT nw,
    CASE WHEN nw BETWEEN {_FUN_MIN_WORDS} AND {_FUN_MAX_WORDS}
         THEN 1 ELSE 0 END AS g1,
    CASE WHEN nw > 0
              AND nc * 1000000 // nw BETWEEN {_FUN_MWL_LO} AND {_FUN_MWL_HI}
         THEN 1 ELSE 0 END AS g2,
    CASE WHEN nw > 0 AND na * 1000000 // nw >= {_FUN_ALPHA_MIN}
         THEN 1 ELSE 0 END AS g3,
    CASE WHEN ns >= {_FUN_STOP_MIN} THEN 1 ELSE 0 END AS g4,
    CASE WHEN n2 > 0 AND (n2 - d2) * 1000000 // n2 <= {_FUN_DUP2_MAX}
         THEN 1 ELSE 0 END AS g5
  FROM f
), agg AS (
  SELECT cast(count(*) AS BIGINT) AS d0, cast(sum(nw) AS BIGINT) AS t0,
         cast(sum(g1) AS BIGINT) AS d1, cast(sum(g1 * nw) AS BIGINT) AS t1,
         cast(sum(g1 * g2) AS BIGINT) AS d2,
         cast(sum(g1 * g2 * nw) AS BIGINT) AS t2,
         cast(sum(g1 * g2 * g3) AS BIGINT) AS d3,
         cast(sum(g1 * g2 * g3 * nw) AS BIGINT) AS t3,
         cast(sum(g1 * g2 * g3 * g4) AS BIGINT) AS d4,
         cast(sum(g1 * g2 * g3 * g4 * nw) AS BIGINT) AS t4,
         cast(sum(g1 * g2 * g3 * g4 * g5) AS BIGINT) AS d5,
         cast(sum(g1 * g2 * g3 * g4 * g5 * nw) AS BIGINT) AS t5
  FROM g
)
{stage_rows}
ORDER BY stage
"""


@register(
    "docs_quality_filter_funnel",
    _funnel_oracle(),
    tags=("llm", "quality", "curation"),
)
def docs_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative quality-gate attrition: one row per pipeline stage.

    Scale design: ONE tokenize pass computes every per-doc feature as
    JVM-side array expressions (no UDFs, no second scan); the funnel
    itself is a single map-side-combining aggregate producing one row
    of 12 counters, unpivoted to the 6 stage rows with `stack` — the
    output is stage-count-sized regardless of corpus size.  Gates
    reuse the integer-exact ppm tests of docs_gopher_quality_flags;
    the repetition gate counts repeated 2-grams via the shared
    distinct-shingle helper.
    """
    docs = spread(load(spark, sf_dir, "documents"))
    ws = tokens(F.col("text"))
    f = docs.select(
        F.size(ws).cast("long").alias("nw"),
        F.aggregate(
            F.transform(ws, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("nc"),
        F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("long").alias("na"),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in _FUN_STOP]),
                lambda s: F.array_contains(ws, s),
            )
        )
        .cast("long")
        .alias("ns"),
        (F.size(ws) - 1).cast("long").alias("n2"),
        F.size(shingles(F.col("text"), 2)).cast("long").alias("d2"),
    )
    g = f.select(
        "nw",
        F.when(F.col("nw").between(_FUN_MIN_WORDS, _FUN_MAX_WORDS), 1)
        .otherwise(0)
        .alias("g1"),
        F.when(
            (F.col("nw") > 0)
            & F.expr("nc * CAST(1000000 AS BIGINT) div nw").between(
                _FUN_MWL_LO, _FUN_MWL_HI
            ),
            1,
        )
        .otherwise(0)
        .alias("g2"),
        F.when(
            (F.col("nw") > 0)
            & (F.expr("na * CAST(1000000 AS BIGINT) div nw") >= _FUN_ALPHA_MIN),
            1,
        )
        .otherwise(0)
        .alias("g3"),
        F.when(F.col("ns") >= _FUN_STOP_MIN, 1).otherwise(0).alias("g4"),
        F.when(
            (F.col("n2") > 0)
            & (
                F.expr("(n2 - d2) * CAST(1000000 AS BIGINT) div n2")
                <= _FUN_DUP2_MAX
            ),
            1,
        )
        .otherwise(0)
        .alias("g5"),
    )
    agg = g.agg(
        F.count(F.lit(1)).cast("long").alias("d0"),
        F.sum("nw").cast("long").alias("t0"),
        *[
            c
            for i in range(1, 6)
            for c in (
                F.sum(
                    F.expr(" * ".join(f"g{j}" for j in range(1, i + 1)))
                )
                .cast("long")
                .alias(f"d{i}"),
                F.sum(
                    F.expr(" * ".join(f"g{j}" for j in range(1, i + 1)) + " * nw")
                )
                .cast("long")
                .alias(f"t{i}"),
            )
        ],
    ).repartition(1)
    stack_expr = "stack(6, " + ", ".join(
        f"'{s}', d{i}, t{i}" for i, s in enumerate(_FUN_STAGES)
    ) + ") AS (stage, n_docs, n_tokens)"
    return (
        agg.select(F.expr(stack_expr), F.col("d0"))
        .select(
            "stage",
            "n_docs",
            "n_tokens",
            F.expr("n_docs * CAST(1000000 AS BIGINT) div d0")
            .cast("long")
            .alias("kept_ppm"),
        )
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# CCNet perplexity buckets (head / middle / tail terciles per source).
# ---------------------------------------------------------------------------

_PPLB_ORACLE = f"""
WITH {PPL_CORE_CTES}, b AS (
  SELECT s.source, p.n_pairs, p.h,
         ntile(3) OVER (PARTITION BY s.source ORDER BY p.h, p.doc_id)
           AS bucket
  FROM perdoc p JOIN (SELECT doc_id, source FROM documents) s
    USING (doc_id)
)
SELECT source, cast(bucket AS BIGINT) AS bucket,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n_pairs) AS BIGINT) AS n_pairs,
       round(cast(sum(cast(h AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
         AS mean_h
FROM b GROUP BY source, bucket
ORDER BY source, bucket
"""


@register(
    "docs_ccnet_perplexity_buckets",
    _PPLB_ORACLE,
    tags=("llm", "text", "quality", "curation"),
    bench=True,
)
def docs_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail: per-source perplexity terciles.

    Scale design: rides the shared add-1 bigram model (`ppl_perdoc` —
    same rounded-double h as the filter curve, so the tercile cuts are
    reproducible across engines); the only new work is ONE
    source-partitioned ntile window over the doc-sized perdoc frame
    and a (source x 3)-row rollup.  mean_h accumulates in
    DECIMAL(18,6) so the per-bucket average is order-independent and
    bit-identical.
    """
    perdoc = ppl_perdoc(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    b = perdoc.join(src, "doc_id").select(
        "source", "n_pairs", "h", F.ntile(3).over(w).alias("bucket")
    )
    return (
        b.groupBy("source", F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_pairs").cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.col("h").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_h"),
        )
        .orderBy("source", "bucket")
    )

"""Round-9 curation / text-pipeline additions.

* ``docs_gopher_quality_flags`` — the Gopher rule-based document
  filters (Rae et al., "Scaling Language Models: ... Gopher", 2021,
  §A1.1): word-count bounds, mean-word-length band, alphabetic-word
  ratio, stopword presence — per-source pass/fail breakdown.  All
  rules are exact-integer (µ-scaled ratios), so the gate is
  bit-reproducible across engines.
* ``docs_temperature_sampling_weights`` — the multilingual sampling
  recipe (XLM-R / mC4): per-language weight ∝ p_lang^α with α = 0.3,
  upsampling low-resource languages.  The single double op (p^α as
  exp(α·ln p)) is rounded to ppm BEFORE normalization, so the
  normalized weights and per-epoch doc budgets are exact integer
  arithmetic on identical inputs in both engines.
* ``docs_ldiversity_sensitive_audit`` — the governance complement of
  k-anonymity (`docs_kanon_quasi_identifier_risk`): per
  quasi-identifier group, distinct-l and entropy-l diversity of the
  sensitive attribute (Machanavajjhala et al., "l-Diversity", 2007).
  Entropy terms ride DECIMAL(18,6) (the Naive-Bayes order-independent
  summation recipe) so the per-group entropy is partition-order-proof.
* ``text_zipf_rank_slope_by_source`` — rank-frequency log-log OLS over
  each source's top-100 terms: the Zipf fit that screens synthetic /
  boilerplate-heavy sources (natural text slopes ≈ −1).  ln terms are
  rounded to DECIMAL(18,6) before the moment sums (exact decimal
  adds), one final double division chain rounded 6.
* ``text_bpe_fertility_by_lang`` — train the 8-merge BPE tokenizer
  (operators/bpe.py) then ENCODE the corpus with it and report
  per-language fertility (tokens per word, ppm) and compression
  (chars per token, ppm) — the end-to-end train→encode composition,
  and the readout a tokenizer team uses to detect languages the vocab
  underserves.  Oracle: the train chain's unrolled CTEs
  (plans/scale_ops3._bpe_chain_parts) extended with an encode chain
  whose per-round replace is gated on the same min-count early-stop.

Scale shapes: every query's corpus-sized stage is a tokenize +
wordcount-shaped shuffle or a pure per-row flag pass; the frames the
statistics run on are vocabulary-, language-, or group-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import sql_normalize_text, tokens
from event_streaming_spark.plans.catalog import load, register, spread

# ---------------------------------------------------------------------------
# Gopher quality flags
# ---------------------------------------------------------------------------

_GQ_STOP = ("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")
_GQ_MIN_WORDS, _GQ_MAX_WORDS = 10, 100_000
_GQ_MWL_LO, _GQ_MWL_HI = 3_000_000, 12_000_000  # mean word length, µ-chars
_GQ_ALPHA_MIN = 700_000  # ppm of words containing a letter
_GQ_STOP_MIN = 2  # distinct stopwords required

_GQ_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in _GQ_STOP) + "]"

_GQ_ORACLE = f"""
WITH feat AS (
  SELECT source,
         ws,
         cast(len(ws) AS BIGINT) AS n_words,
         cast(list_aggregate(list_transform(ws, w -> length(w)), 'sum')
              AS BIGINT) AS n_chars,
         cast(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
              AS BIGINT) AS n_alpha,
         cast(len(list_filter({_GQ_STOP_SQL},
                              s -> list_contains(ws, s))) AS BIGINT) AS n_stop
  FROM (
    SELECT source,
           string_split({sql_normalize_text('text')}, ' ') AS ws
    FROM documents
  )
), flags AS (
  SELECT source,
         CASE WHEN n_words BETWEEN {_GQ_MIN_WORDS} AND {_GQ_MAX_WORDS}
              THEN 1 ELSE 0 END AS words_ok,
         CASE WHEN n_words > 0
                   AND n_chars * 1000000 // n_words BETWEEN {_GQ_MWL_LO} AND {_GQ_MWL_HI}
              THEN 1 ELSE 0 END AS mwl_ok,
         CASE WHEN n_words > 0
                   AND n_alpha * 1000000 // n_words >= {_GQ_ALPHA_MIN}
              THEN 1 ELSE 0 END AS alpha_ok,
         CASE WHEN n_stop >= {_GQ_STOP_MIN} THEN 1 ELSE 0 END AS stop_ok
  FROM feat
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(1 - words_ok) AS BIGINT) AS fail_words,
       cast(sum(1 - mwl_ok) AS BIGINT) AS fail_mwl,
       cast(sum(1 - alpha_ok) AS BIGINT) AS fail_alpha,
       cast(sum(1 - stop_ok) AS BIGINT) AS fail_stop,
       cast(sum(words_ok * mwl_ok * alpha_ok * stop_ok) AS BIGINT) AS n_pass,
       cast(sum(words_ok * mwl_ok * alpha_ok * stop_ok) * 1000000
            // count(*) AS BIGINT) AS pass_ppm
FROM flags
GROUP BY source ORDER BY source
"""


@register(
    "docs_gopher_quality_flags",
    _GQ_ORACLE,
    tags=("llm", "quality", "curation"),
)
def docs_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher filter report.  One tokenize pass; every rule
    is a JVM-side array expression over the token list; the rollup is a
    source-keyed partial aggregate — no UDFs, no second scan."""
    docs = spread(load(spark, sf_dir, "documents"))
    ws = tokens(F.col("text"))
    feat = docs.select(
        "source",
        F.size(ws).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(ws, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_chars"),
        F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("long").alias(
            "n_alpha"
        ),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in _GQ_STOP]),
                lambda s: F.array_contains(ws, s),
            )
        )
        .cast("long")
        .alias("n_stop"),
    )
    mwl = (F.col("n_chars") * 1_000_000 / F.col("n_words")).cast("long")
    alpha_ppm = (F.col("n_alpha") * 1_000_000 / F.col("n_words")).cast("long")
    flags = feat.select(
        "source",
        F.when(
            F.col("n_words").between(_GQ_MIN_WORDS, _GQ_MAX_WORDS), 1
        )
        .otherwise(0)
        .alias("words_ok"),
        F.when(
            (F.col("n_words") > 0) & mwl.between(_GQ_MWL_LO, _GQ_MWL_HI), 1
        )
        .otherwise(0)
        .alias("mwl_ok"),
        F.when((F.col("n_words") > 0) & (alpha_ppm >= _GQ_ALPHA_MIN), 1)
        .otherwise(0)
        .alias("alpha_ok"),
        F.when(F.col("n_stop") >= _GQ_STOP_MIN, 1).otherwise(0).alias("stop_ok"),
    )
    allpass = (
        F.col("words_ok") * F.col("mwl_ok") * F.col("alpha_ok") * F.col("stop_ok")
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(1 - F.col("words_ok")).cast("long").alias("fail_words"),
            F.sum(1 - F.col("mwl_ok")).cast("long").alias("fail_mwl"),
            F.sum(1 - F.col("alpha_ok")).cast("long").alias("fail_alpha"),
            F.sum(1 - F.col("stop_ok")).cast("long").alias("fail_stop"),
            F.sum(allpass).cast("long").alias("n_pass"),
        )
        .select(
            "source",
            "n_docs",
            "fail_words",
            "fail_mwl",
            "fail_alpha",
            "fail_stop",
            "n_pass",
            (F.col("n_pass") * 1_000_000 / F.col("n_docs"))
            .cast("long")
            .alias("pass_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Temperature sampling weights (α = 0.3)
# ---------------------------------------------------------------------------

_TEMP_ALPHA = "0.3"  # shared literal — identical double in both engines

_TEMP_ORACLE = f"""
WITH per_lang AS (
  SELECT lang,
         cast(count(*) AS BIGINT) AS n_docs,
         cast(sum(len(string_split({sql_normalize_text('text')}, ' ')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
), tot AS (
  SELECT lang, n_docs, n_tokens,
         cast(sum(n_tokens) OVER () AS BIGINT) AS tot_tokens,
         cast(sum(n_docs) OVER () AS BIGINT) AS tot_docs
  FROM per_lang
), raw AS (
  SELECT lang, n_docs, n_tokens,
         cast(n_tokens * 1000000 // tot_tokens AS BIGINT) AS share_ppm,
         cast(round(1000000 * exp({_TEMP_ALPHA} * ln(
           cast(n_tokens AS DOUBLE) / cast(tot_tokens AS DOUBLE)
         ))) AS BIGINT) AS raw_ppm,
         tot_docs
  FROM tot
)
SELECT lang, n_docs, n_tokens, share_ppm,
       cast(raw_ppm * 1000000 // (sum(raw_ppm) OVER ()) AS BIGINT)
         AS weight_ppm,
       cast(raw_ppm * 1000000 // (sum(raw_ppm) OVER ()) * tot_docs
            // 1000000 AS BIGINT) AS docs_per_epoch
FROM raw
ORDER BY lang
"""


@register(
    "docs_temperature_sampling_weights",
    _TEMP_ORACLE,
    tags=("llm", "sampling", "mixing"),
)
def docs_temperature_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p_lang^0.3 mixing weights.  The ONLY double op (exp(α·ln p)) is
    rounded to ppm before normalization; the window sums are exact
    integer adds over the language-bounded frame, so normalized weights
    and epoch budgets are deterministic.  Scale: one tokenize-count
    scan; everything after runs on ≤ |languages| rows."""
    docs = load(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text"))).cast("long"))
        .cast("long")
        .alias("n_tokens"),
    )
    wall = Window.partitionBy()
    tot = per_lang.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(wall).cast("long").alias("tot_tokens"),
        F.sum("n_docs").over(wall).cast("long").alias("tot_docs"),
    )
    p = F.col("n_tokens").cast("double") / F.col("tot_tokens").cast("double")
    raw = tot.select(
        "lang",
        "n_docs",
        "n_tokens",
        # exact integer div — token-count numerators (n_tokens * 1e6) cross
        # 2^53 near ~9e9 corpus tokens, where double / + cast('long') would
        # silently round; `div` matches the oracle's `//` at any scale.
        F.expr("(n_tokens * CAST(1000000 AS BIGINT)) div tot_tokens")
        .cast("long")
        .alias("share_ppm"),
        F.round(1_000_000 * F.exp(F.lit(float(_TEMP_ALPHA)) * F.log(p)))
        .cast("long")
        .alias("raw_ppm"),
        "tot_docs",
    )
    w = raw.withColumn("sum_raw", F.sum("raw_ppm").over(wall).cast("long"))
    w_ppm = F.expr("(raw_ppm * CAST(1000000 AS BIGINT)) div sum_raw")
    return w.select(
        "lang",
        "n_docs",
        "n_tokens",
        "share_ppm",
        w_ppm.cast("long").alias("weight_ppm"),
        F.expr(
            "((raw_ppm * CAST(1000000 AS BIGINT)) div sum_raw * tot_docs)"
            " div CAST(1000000 AS BIGINT)"
        )
        .cast("long")
        .alias("docs_per_epoch"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# l-diversity audit over the k-anonymity quasi-identifier
# ---------------------------------------------------------------------------

_LDIV_BUCKET = 50  # n_chars bucket width — matches the k-anon audit

_LDIV_ORACLE = f"""
WITH cell AS (
  SELECT source, n_chars // {_LDIV_BUCKET} AS len_bucket, lang,
         cast(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, n_chars // {_LDIV_BUCKET}, lang
), grp AS (
  SELECT source, len_bucket,
         cast(sum(c) AS BIGINT) AS k,
         cast(count(*) AS BIGINT) AS l_distinct,
         sum(cast(round(c * ln(cast(c AS DOUBLE)), 6) AS DECIMAL(18,6)))
           AS s_clnc
  FROM cell GROUP BY source, len_bucket
)
SELECT source, len_bucket, k, l_distinct,
       round(ln(cast(k AS DOUBLE)) - cast(s_clnc AS DOUBLE)
             / cast(k AS DOUBLE), 6) + 0.0 AS entropy_l,
       CASE WHEN l_distinct < 2 THEN 1 ELSE 0 END AS risky
FROM grp
ORDER BY source, len_bucket
"""


@register(
    "docs_ldiversity_sensitive_audit",
    _LDIV_ORACLE,
    tags=("llm", "privacy", "audit"),
)
def docs_ldiversity_sensitive_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l and entropy-l per (source, length-bucket) QI group,
    sensitive attribute = lang.  H = ln k − (Σ c·ln c)/k; each c·ln c
    term is rounded to DECIMAL(18,6) so the Σ is an exact decimal add
    (order-independent), then one final double chain rounded 6.  Scale:
    one groupBy to cells, one to groups — both map-side combined."""
    docs = load(spark, sf_dir, "documents")
    cell = docs.groupBy(
        "source",
        F.expr(f"n_chars div {_LDIV_BUCKET}").alias("len_bucket"),
        "lang",
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    term = F.round(
        F.col("c") * F.log(F.col("c").cast("double")), 6
    ).cast("decimal(18,6)")
    grp = cell.groupBy("source", "len_bucket").agg(
        F.sum("c").cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
        F.sum(term).alias("s_clnc"),
    )
    # + 0.0 normalizes IEEE -0.0 (a 1-language group rounds to a tiny
    # negative) so both engines emit the same sign — mirrored in the
    # oracle.
    entropy = (
        F.round(
            F.log(F.col("k").cast("double"))
            - F.col("s_clnc").cast("double") / F.col("k").cast("double"),
            6,
        )
        + F.lit(0.0)
    )
    return grp.select(
        "source",
        "len_bucket",
        "k",
        "l_distinct",
        entropy.alias("entropy_l"),
        F.when(F.col("l_distinct") < 2, 1).otherwise(0).alias("risky"),
    ).orderBy("source", "len_bucket")


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope per source
# ---------------------------------------------------------------------------

_ZIPF_TOPK = 100

_ZIPF_ORACLE = f"""
WITH tf AS (
  SELECT source, term, cast(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT source,
           unnest(string_split({sql_normalize_text('text')}, ' ')) AS term
    FROM documents
  ) WHERE length(term) > 0
  GROUP BY source, term
), ranked AS (
  SELECT source, cnt,
         row_number() OVER (PARTITION BY source
                            ORDER BY cnt DESC, term) AS rnk
  FROM tf
), pts AS (
  SELECT source,
         cast(round(ln(cast(rnk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
         cast(round(ln(cast(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
  FROM ranked WHERE rnk <= {_ZIPF_TOPK}
), mom AS (
  SELECT source,
         cast(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts GROUP BY source
)
SELECT source, n,
       round((cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
              - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
             / (cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
                - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)), 6) AS slope,
       round((cast(sy AS DOUBLE) - ((cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
              - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
             / (cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
                - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)))
              * cast(sx AS DOUBLE)) / cast(n AS DOUBLE), 6) AS intercept
FROM mom
ORDER BY source
"""


@register(
    "text_zipf_rank_slope_by_source",
    _ZIPF_ORACLE,
    tags=("llm", "text", "stats"),
)
def text_zipf_rank_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log-log OLS over each source's top-100 terms.  ln terms round to
    DECIMAL(18,6) before the moment sums (exact adds — the NB recipe),
    so Σx, Σy, Σxy, Σx² are order-independent; the slope/intercept
    chain is fixed IEEE ops on identical doubles.  Scale: wordcount
    shuffle + two-stage top-k per source; the OLS runs on 100 rows per
    source."""
    from event_streaming_spark.operators.ranks import topk_per_group

    docs = spread(load(spark, sf_dir, "documents"))
    tf = (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("term")
        )
        .where(F.length("term") > 0)
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ranked = topk_per_group(
        tf, "source", [F.desc("cnt"), F.asc("term")], _ZIPF_TOPK, rn_col="rnk"
    )
    dec = lambda c: F.round(F.log(c.cast("double")), 6).cast("decimal(18,6)")
    pts = ranked.select(
        "source", dec(F.col("rnk")).alias("x"), dec(F.col("cnt")).alias("y")
    )
    mom = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return mom.select(
        "source",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / nd, 6).alias("intercept"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# BPE fertility by language (train → encode composition)
# ---------------------------------------------------------------------------


def _fertility_oracle() -> str:
    from event_streaming_spark.plans.scale_ops3 import (
        _BPE_MERGES,
        _BPE_MIN_COUNT,
        _bpe_chain_parts,
    )

    parts = _bpe_chain_parts(_BPE_MERGES)
    parts.append(
        f"""lw AS MATERIALIZED (
  SELECT lang, word, cast(count(*) AS BIGINT) AS wc
  FROM (
    SELECT lang,
           unnest(string_split({sql_normalize_text('text')}, ' ')) AS word
    FROM documents
  ) WHERE length(word) > 0 GROUP BY lang, word
),
e0 AS MATERIALIZED (
  SELECT lang, wc, cast(length(word) AS BIGINT) AS wlen,
         '|' || regexp_replace(word, '(.)', '|\\1|', 'g') || '|' AS w
  FROM lw
)"""
    )
    for k in range(1, _BPE_MERGES + 1):
        parts.append(
            f"""e{k} AS MATERIALIZED (
  SELECT lang, wc, wlen,
         CASE WHEN b.cnt >= {_BPE_MIN_COUNT}
              THEN replace(w, '|' || b.l || '||' || b.r || '|',
                           '|' || b.l || b.r || '|')
              ELSE w END AS w
  FROM e{k-1}, best{k} b
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT lang,
       cast(sum(wc) AS BIGINT) AS n_words,
       cast(sum(wc * n_toks) AS BIGINT) AS n_tokens,
       cast(sum(wc * n_toks) * 1000000 // sum(wc) AS BIGINT)
         AS fertility_ppm,
       cast(sum(wc * wlen) * 1000000 // sum(wc * n_toks) AS BIGINT)
         AS chars_per_token_ppm
FROM (
  SELECT lang, wc, wlen,
         cast(len(string_split(trim(w, '|'), '||')) AS BIGINT) AS n_toks
  FROM e{_BPE_MERGES}
)
GROUP BY lang ORDER BY lang"""
    )


@register(
    "text_bpe_fertility_by_lang",
    _fertility_oracle(),
    tags=("llm", "text", "tokenizer"),
    bench=True,
)
def text_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the corpus BPE (8 merges, global word-frequency table) and
    encode every (lang, word) with it; report per-language tokens-per-
    word and chars-per-token in exact ppm.  Scale: training touches
    only the vocabulary table (operators/bpe.py module doc); encode is
    a narrow per-row fold; the readout is language-bounded."""
    from event_streaming_spark.operators.bpe import bpe_encode, bpe_train
    from event_streaming_spark.plans.scale_ops3 import _BPE_MERGES

    from event_streaming_spark.operators.materialize import materialize

    docs = spread(load(spark, sf_dir, "documents"))
    # pin the (lang, word) frequency table: BOTH the trainer (via the
    # global rollup) and the encoder consume it — without the pin each
    # consumer re-tokenizes the corpus (EXPLAINS showed 2 fact scans).
    lang_words = materialize(
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc")),
        "fertility-lang-words",
    )
    gwords = lang_words.groupBy("word").agg(F.sum("wc").cast("long").alias("wc"))
    merges = bpe_train(gwords, _BPE_MERGES)
    enc = lang_words.select(
        "lang",
        "wc",
        F.length("word").cast("long").alias("wlen"),
        F.size(bpe_encode(F.col("word"), merges)).cast("long").alias("n_toks"),
    )
    return (
        enc.groupBy("lang")
        .agg(
            F.sum("wc").cast("long").alias("n_words"),
            F.sum(F.col("wc") * F.col("n_toks")).cast("long").alias("n_tokens"),
            F.sum(F.col("wc") * F.col("wlen")).cast("long").alias("n_wchars"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            (F.col("n_tokens") * 1_000_000 / F.col("n_words"))
            .cast("long")
            .alias("fertility_ppm"),
            (F.col("n_wchars") * 1_000_000 / F.col("n_tokens"))
            .cast("long")
            .alias("chars_per_token_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Dedup survivorship report — the production OUTPUT of the near-dup
# pipeline.  The cluster queries (plans/curation.py) label documents;
# this one decides WHO SURVIVES and accounts for what was dropped: per
# multi-member cluster, the survivor under the deterministic policy
# (longest text wins, doc_id breaks ties) plus kept/dropped volumes.
# The policy intentionally differs from the min-id canonical used by
# corpus_curation_end_to_end — min-id is the cheap label; longest-text
# is what a quality-first pipeline ships, and the report is the diff a
# reviewer signs off on.
# Scale: the cluster labels come from the pointer-doubled CC (never
# all-pairs); the survivor pick is ONE max_by-style aggregate per
# cluster key (no per-cluster window sort), the report is
# clusters-sized.
# ---------------------------------------------------------------------------


def _survivorship_oracle() -> str:
    from event_streaming_spark.plans.curation import _CC_ORACLE

    return f"""
WITH clu AS MATERIALIZED ({_CC_ORACLE}),
mem AS (
  SELECT l.cluster_id, d.doc_id, d.n_chars
  FROM documents d JOIN clu l ON d.doc_id = l.doc_id
), ranked AS (
  SELECT cluster_id, doc_id, n_chars,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM mem
)
SELECT cluster_id,
       cast(count(*) AS BIGINT) AS n_members,
       cast(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS survivor_doc,
       cast(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
         AS survivor_chars,
       cast(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_dropped,
       cast(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) * 1000000
            // sum(n_chars) AS BIGINT) AS drop_ppm
FROM ranked
GROUP BY cluster_id
HAVING count(*) >= 2
ORDER BY cluster_id
"""


@register(
    "docs_dedup_survivorship_report",
    _survivorship_oracle(),
    tags=("llm", "dedup", "curation"),
    # bench-tagged (VERDICT r9 #8): at 27.2 s/10x this is one of the two
    # heaviest catalog entries — the regression trail must cover it.
    bench=True,
)
def docs_dedup_survivorship_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-text survivor per near-dup cluster + dropped-volume
    accounting.  The survivor pick is a single max(struct) aggregate —
    (n_chars, -doc_id) lexicographic max == longest-then-lowest-id —
    no per-cluster row_number sort pass."""
    from event_streaming_spark.plans.curation import dedup_near_dup_clusters

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labels = dedup_near_dup_clusters(spark, sf_dir)
    mem = labels.join(docs, "doc_id")
    pick = F.max(
        F.struct(
            F.col("n_chars").alias("c"), (-F.col("doc_id")).alias("negid")
        )
    )
    out = (
        mem.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            pick.alias("best"),
            F.sum("n_chars").cast("long").alias("chars_total"),
        )
        .where(F.col("n_members") >= 2)
        .select(
            "cluster_id",
            "n_members",
            (-F.col("best.negid")).cast("long").alias("survivor_doc"),
            F.col("best.c").cast("long").alias("survivor_chars"),
            (F.col("chars_total") - F.col("best.c"))
            .cast("long")
            .alias("chars_dropped"),
            (
                (F.col("chars_total") - F.col("best.c"))
                * 1_000_000
                / F.col("chars_total")
            )
            .cast("long")
            .alias("drop_ppm"),
        )
        .orderBy("cluster_id")
    )
    return out

"""Round-11 lexical statistics, tranche 2: term burstiness and the
Kneser-Ney bigram reference model.

* ``text_term_burstiness_topk`` — Church & Gale's burstiness readout:
  the variance-to-mean ratio (VMR) of per-document term counts, with
  absent documents counted as zeros (the whole point — a bursty term
  concentrates its occurrences in few documents, so VMR >> 1 even when
  total frequency matches a uniform term).  Boilerplate and templated
  content light up here before any dedup pass sees them.  Moments are
  exact integer sums over the (term, doc) count table; the zero-docs
  correction enters arithmetically (sum over absent docs of 0 and 0²),
  so no dense vocab x docs grid is ever built.
* ``text_kneser_ney_surprisal_by_source`` — per-source corpus surprisal
  under an interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
  Goodman 1999) fit on the same reference slice as the add-1 model
  (``_PPL_REF_SOURCE``): absolute discount D = 0.75, continuation
  probability from distinct-predecessor counts with an add-1 floor so
  unseen events stay finite.  The defining KN property — a bigram's
  backoff weight uses how many DISTINCT contexts a word completes, not
  its raw frequency — is what the add-1 twin cannot express; scoring
  both (same pairs, same rounding discipline) makes the model-choice
  delta measurable per source.

100 TB shape: both ride wordcount-shaped shuffles ((term, doc) /
(source, w1, w2) count tables); every model table is vocab- or
vocab²-bounded and joins under AQE; outputs are top-k / source-sized.

Reference parity note: the reference engine has no text surface
(SURVEY §2); these extend the curation pack (plans/curation*.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import sql_normalize_text, tokens
from event_streaming_spark.operators.materialize import materialize
from event_streaming_spark.functions.localframe import local_frame
from event_streaming_spark.plans.catalog import load, register, spread
from event_streaming_spark.plans.curation6 import _PPL_REF_SOURCE

# ---------------------------------------------------------------------------
# Term burstiness (VMR) top-k.
# ---------------------------------------------------------------------------

_BURST_MIN_DF = 25  # support floor: VMR of a 3-doc term is noise
_BURST_K = 20

_BURST_ORACLE = f"""
WITH dtf AS MATERIALIZED (
  SELECT w, doc_id, cast(count(*) AS BIGINT) AS c FROM (
    SELECT doc_id, unnest(string_split({sql_normalize_text('text')}, ' ')) AS w
    FROM documents)
  GROUP BY w, doc_id
), nd AS (
  SELECT cast(count(*) AS BIGINT) AS n FROM documents
), t AS (
  SELECT w, cast(count(*) AS BIGINT) AS df,
         cast(sum(c) AS BIGINT) AS tf,
         cast(sum(c * c) AS BIGINT) AS tf2
  FROM dtf GROUP BY w
)
SELECT w AS term, df, tf,
       round(((cast(tf2 AS DOUBLE) - cast(tf AS DOUBLE) * cast(tf AS DOUBLE)
                                      / nd.n) / (nd.n - 1))
             / (cast(tf AS DOUBLE) / nd.n), 6) AS vmr
FROM t, nd
WHERE df >= {_BURST_MIN_DF}
ORDER BY vmr DESC, term
LIMIT {_BURST_K}
"""


@register(
    "text_term_burstiness_topk",
    _BURST_ORACLE,
    tags=("llm", "text", "quality", "stats"),
)
def text_term_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k terms by variance-to-mean ratio of per-doc counts.

    Scale design: one tokenize pass → a (term, doc)-keyed wordcount
    aggregate → a vocab-sized moment rollup.  Zero-count documents
    enter the variance arithmetically through N (sum and sum-of-squares
    of absent docs are 0), so the dense vocab x docs grid never
    materializes.  tf² fits int64 (per-doc counts are tiny); the VMR
    is one fixed double chain over exact integers, rounded to 6dp.
    """
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    dtf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    nd = load(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = dtf.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("tf"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("tf2"),
    )
    vmr = F.round(
        (
            (
                F.col("tf2").cast("double")
                - F.col("tf").cast("double")
                * F.col("tf").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        )
        / (F.col("tf").cast("double") / F.col("n")),
        6,
    )
    return (
        t.where(F.col("df") >= _BURST_MIN_DF)
        .crossJoin(F.broadcast(nd))
        .select(F.col("w").alias("term"), "df", "tf", vmr.alias("vmr"))
        .orderBy(F.desc("vmr"), "term")
        .limit(_BURST_K)
    )


# ---------------------------------------------------------------------------
# Kneser-Ney bigram surprisal by source.
# ---------------------------------------------------------------------------

_KN_D = 0.75  # absolute discount

_KN_ORACLE = f"""
WITH pairs AS MATERIALIZED (
  SELECT doc_id, source,
         unnest(tk[1:len(tk)-1]) AS w1,
         unnest(tk[2:len(tk)]) AS w2
  FROM (SELECT doc_id, source,
               string_split({sql_normalize_text('text')}, ' ') AS tk
        FROM documents)
), ptype AS MATERIALIZED (
  SELECT source, w1, w2, cast(count(*) AS BIGINT) AS m
  FROM pairs GROUP BY source, w1, w2
), refb AS MATERIALIZED (
  SELECT w1, w2, cast(count(*) AS BIGINT) AS cb
  FROM pairs WHERE source = '{_PPL_REF_SOURCE}' GROUP BY w1, w2
), refc1 AS MATERIALIZED (
  SELECT w1, cast(count(*) AS BIGINT) AS c1,
         cast(count(DISTINCT w2) AS BIGINT) AS n1p
  FROM pairs WHERE source = '{_PPL_REF_SOURCE}' GROUP BY w1
), refpre AS MATERIALIZED (
  SELECT w2, cast(count(DISTINCT w1) AS BIGINT) AS npre
  FROM pairs WHERE source = '{_PPL_REF_SOURCE}' GROUP BY w2
), gkn AS (
  SELECT cast(count(*) AS BIGINT) AS nbi,
         cast(count(DISTINCT w2) + 1 AS BIGINT) AS vc
  FROM refb
), scored AS MATERIALIZED (
  SELECT p.source, p.m,
         cast(round(ln(
           CASE WHEN coalesce(u.c1, 0) > 0 THEN
             greatest(cast(coalesce(b.cb, 0) AS DOUBLE) - {_KN_D!r}, 0.0)
               / u.c1
             + {_KN_D!r} * u.n1p / u.c1
               * ((cast(coalesce(r.npre, 0) AS DOUBLE) + 1.0)
                  / (g.nbi + g.vc))
           ELSE
             (cast(coalesce(r.npre, 0) AS DOUBLE) + 1.0) / (g.nbi + g.vc)
           END), 6) AS DECIMAL(18,6)) AS lp
  FROM ptype p
  LEFT JOIN refb b ON b.w1 = p.w1 AND b.w2 = p.w2
  LEFT JOIN refc1 u ON u.w1 = p.w1
  LEFT JOIN refpre r ON r.w2 = p.w2
  CROSS JOIN gkn g
)
SELECT source, cast(sum(m) AS BIGINT) AS n_pairs,
       round(-cast(sum(lp * m) AS DOUBLE) / cast(sum(m) AS DOUBLE), 6)
         AS h_kn
FROM scored GROUP BY source ORDER BY source
"""


@register(
    "text_kneser_ney_surprisal_by_source",
    _KN_ORACLE,
    tags=("llm", "text", "quality", "stats"),
)
def text_kneser_ney_surprisal_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source cross-entropy under an interpolated KN bigram LM.

    Scale design: same single tokenize pass and (source, w1, w2)
    pair-type rollup as the add-1 model; the KN tables (bigram counts,
    per-context token/continuation counts, per-word predecessor
    counts) are all vocab- or vocab²-bounded and join under AQE (no
    forced broadcast — the r10 lesson); the interpolation is one fixed
    double chain per pair TYPE, rounded into DECIMAL(18,6) before the
    order-free weighted sum.  Unseen contexts fall back to the add-1
    floored continuation distribution, so every scored pair is finite.
    """
    docs = spread(load(spark, sf_dir, "documents"))
    pairs = (
        docs.select("doc_id", "source", tokens(F.col("text")).alias("s"))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(s) < 2 THEN "
                    "cast(array() as array<struct<w1:string,w2:string>>) "
                    "ELSE transform(sequence(1, size(s) - 1), "
                    "i -> struct(s[i-1] AS w1, s[i] AS w2)) END"
                )
            ).alias("p"),
        )
        .select("source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    pairs = materialize(pairs, "kn-pairs")
    ptype = pairs.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    ref = pairs.where(F.col("source") == _PPL_REF_SOURCE)
    refb = ref.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    refc1 = ref.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c1"),
        F.countDistinct("w2").cast("long").alias("n1p"),
    )
    refpre = ref.groupBy("w2").agg(
        F.countDistinct("w1").cast("long").alias("npre")
    )
    glob = refb.agg(
        F.count(F.lit(1)).cast("long").alias("nbi"),
        (F.countDistinct("w2") + 1).cast("long").alias("vc"),
    )
    pcont = (F.coalesce(F.col("npre"), F.lit(0)).cast("double") + F.lit(1.0)) / (
        F.col("nbi") + F.col("vc")
    )
    p_kn = F.when(
        F.coalesce(F.col("c1"), F.lit(0)) > 0,
        F.greatest(
            F.coalesce(F.col("cb"), F.lit(0)).cast("double") - F.lit(_KN_D),
            F.lit(0.0),
        )
        / F.col("c1")
        + F.lit(_KN_D) * F.col("n1p") / F.col("c1") * pcont,
    ).otherwise(pcont)
    scored = (
        ptype.join(refb, ["w1", "w2"], "left")
        .join(refc1, ["w1"], "left")
        .join(refpre, ["w2"], "left")
        .crossJoin(F.broadcast(glob))
        .select(
            "source",
            "m",
            F.round(F.log(p_kn), 6).cast("decimal(18,6)").alias("lp"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.sum("m").cast("long").alias("n_pairs"),
            F.round(
                -F.sum(F.col("lp") * F.col("m")).cast("double")
                / F.sum("m").cast("double"),
                6,
            ).alias("h_kn"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Context-length truncation-waste curve.
# ---------------------------------------------------------------------------

_TRUNC_LENS = (64, 128, 256, 512)

_TRUNC_ORACLE = f"""
WITH dt AS MATERIALIZED (
  SELECT source,
         cast(len(string_split({sql_normalize_text('text')}, ' ')) AS BIGINT)
           AS n_tok
  FROM documents
), grid AS (
  SELECT d.source, d.n_tok, l.context_len
  FROM dt d, (VALUES {', '.join(f'({L})' for L in _TRUNC_LENS)}) l(context_len)
), agg AS (
  SELECT source, cast(context_len AS BIGINT) AS context_len,
         cast(count(*) AS BIGINT) AS n_docs,
         cast(coalesce(sum(CASE WHEN n_tok > context_len THEN 1 END), 0)
              AS BIGINT) AS docs_over,
         cast(sum(n_tok) AS BIGINT) AS tot_tokens,
         cast(coalesce(sum(CASE WHEN n_tok > context_len
                                THEN n_tok - context_len END), 0) AS BIGINT)
           AS tokens_lost
  FROM grid GROUP BY source, context_len
)
SELECT source, context_len, n_docs, docs_over,
       cast((2000000 * cast(docs_over AS HUGEINT) + n_docs)
            // (2 * cast(n_docs AS HUGEINT)) AS BIGINT) AS docs_over_ppm,
       cast((2000000 * cast(tokens_lost AS HUGEINT) + tot_tokens)
            // (2 * cast(tot_tokens AS HUGEINT)) AS BIGINT) AS tokens_lost_ppm
FROM agg
ORDER BY source, context_len
"""


@register(
    "docs_truncation_waste_curve",
    _TRUNC_ORACLE,
    tags=("llm", "text", "quality", "curve"),
)
def docs_truncation_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens lost to truncation per (source, context length) — the
    curve a pretraining team reads before fixing the sequence length.

    Scale design: ONE tokenize pass reduces the corpus to a per-doc
    token count (no token rows ever shuffle — only (source, n_tok)
    pairs); the 4-length grid is a literal-VALUES fanout of the
    already-aggregated per-doc frame, and the ppm arithmetic is
    HUGEINT/DECIMAL round-half-up division (token totals at 100 TB
    exceed int64·10⁶).
    """
    docs = spread(load(spark, sf_dir, "documents").select("source", "text"))
    dt = docs.select(
        "source", F.size(tokens(F.col("text"))).cast("long").alias("n_tok")
    )
    lens = local_frame(docs.sparkSession, 
        [(L,) for L in _TRUNC_LENS], "context_len long"
    ).coalesce(1)
    agg = (
        dt.crossJoin(F.broadcast(lens))
        .groupBy("source", "context_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(
                F.sum(F.when(F.col("n_tok") > F.col("context_len"), 1)),
                F.lit(0),
            )
            .cast("long")
            .alias("docs_over"),
            F.sum("n_tok").cast("long").alias("tot_tokens"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("n_tok") > F.col("context_len"),
                        F.col("n_tok") - F.col("context_len"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tokens_lost"),
        )
    )
    over_ppm = F.expr(
        "cast((2000000 * cast(docs_over as decimal(38,0)) + n_docs)"
        " div (2 * cast(n_docs as decimal(38,0))) as bigint)"
    )
    lost_ppm = F.expr(
        "cast((2000000 * cast(tokens_lost as decimal(38,0)) + tot_tokens)"
        " div (2 * cast(tot_tokens as decimal(38,0))) as bigint)"
    )
    return agg.select(
        "source",
        "context_len",
        "n_docs",
        "docs_over",
        over_ppm.alias("docs_over_ppm"),
        lost_ppm.alias("tokens_lost_ppm"),
    ).orderBy("source", "context_len")


# ---------------------------------------------------------------------------
# DoReMi-style excess-loss domain weights.
# ---------------------------------------------------------------------------

_DRM_ORACLE = f"""
WITH pairs AS MATERIALIZED (
  SELECT source,
         unnest(tk[1:len(tk)-1]) AS w1,
         unnest(tk[2:len(tk)]) AS w2
  FROM (SELECT source, string_split({sql_normalize_text('text')}, ' ') AS tk
        FROM documents)
), ptype AS MATERIALIZED (
  SELECT source, w1, w2, cast(count(*) AS BIGINT) AS m
  FROM pairs GROUP BY source, w1, w2
), refp AS MATERIALIZED (
  SELECT w1, w2, cast(count(*) AS BIGINT) AS cb
  FROM pairs WHERE source = '{_PPL_REF_SOURCE}' GROUP BY w1, w2
), refu AS MATERIALIZED (
  SELECT w1, cast(count(*) AS BIGINT) AS cu
  FROM pairs WHERE source = '{_PPL_REF_SOURCE}' GROUP BY w1
), reft AS MATERIALIZED (
  SELECT w2 AS t, cast(count(*) AS BIGINT) AS ct
  FROM pairs WHERE source = '{_PPL_REF_SOURCE}' GROUP BY w2
), refn AS (
  SELECT cast(count(*) AS BIGINT) AS nref FROM pairs
  WHERE source = '{_PPL_REF_SOURCE}'
), vocab AS (
  SELECT cast(count(DISTINCT t) AS BIGINT) AS v FROM (
    SELECT w1 AS t FROM pairs WHERE source = '{_PPL_REF_SOURCE}'
    UNION SELECT w2 FROM pairs WHERE source = '{_PPL_REF_SOURCE}')
), scored AS MATERIALIZED (
  SELECT p.source, p.m,
         cast(round(ln((coalesce(r.cb, 0) + 1.0)
                       / (coalesce(u.cu, 0) + vocab.v)), 6)
              AS DECIMAL(18,6)) AS lpb,
         cast(round(ln((coalesce(t.ct, 0) + 1.0)
                       / (refn.nref + vocab.v)), 6)
              AS DECIMAL(18,6)) AS lpu
  FROM ptype p
  LEFT JOIN refp r ON r.w1 = p.w1 AND r.w2 = p.w2
  LEFT JOIN refu u ON u.w1 = p.w1
  LEFT JOIN reft t ON t.t = p.w2
  CROSS JOIN vocab CROSS JOIN refn
), persrc AS MATERIALIZED (
  SELECT source, cast(sum(m) AS BIGINT) AS n_pairs,
         round(-cast(sum(lpb * m) AS DOUBLE) / cast(sum(m) AS DOUBLE), 6)
           AS h_bigram,
         round(-cast(sum(lpu * m) AS DOUBLE) / cast(sum(m) AS DOUBLE), 6)
           AS h_unigram
  FROM scored GROUP BY source
), ex AS (
  SELECT source, n_pairs, h_bigram, h_unigram,
         greatest(0, cast(round(h_unigram * 1e6) AS BIGINT)
                     - cast(round(h_bigram * 1e6) AS BIGINT)) AS excess_fp6
  FROM persrc
), tot AS (SELECT cast(sum(excess_fp6) AS BIGINT) AS te FROM ex)
SELECT source, n_pairs, h_bigram, h_unigram, excess_fp6,
       cast(CASE WHEN tot.te > 0 THEN
         (2000000 * excess_fp6 + tot.te) // (2 * tot.te) ELSE 0 END
         AS BIGINT) AS weight_ppm
FROM ex, tot
ORDER BY source
"""


@register(
    "docs_doremi_excess_loss_weights",
    _DRM_ORACLE,
    tags=("llm", "text", "sampling", "stats"),
)
def docs_doremi_excess_loss_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture weights from reducible excess loss.

    DoReMi (Xie et al. 2023) upweights domains where a stronger proxy
    model still beats the reference — the reducible-loss signal (RHO:
    Mindermann et al. 2022).  Instantiated on the repo's exact LM
    stack: reference = add-1 unigram, proxy = add-1 bigram, both fit
    on the shared ``_PPL_REF_SOURCE`` slice; a source's excess
    H(unigram) − H(bigram) is how much context structure the domain
    has left to teach, and weights normalize the clamped excesses.

    Scale design: ONE tokenize pass → a (source, w1, w2)-keyed
    wordcount shuffle; every model table is vocab/vocab²-bounded and
    joins under AQE; per-pair log-probs round to DECIMAL(18,6) BEFORE
    the weighted sums, so both engines sum identical fixed-point
    values in any order; the excess/weight arithmetic is integer ppm
    on the source-sized frame.
    """
    docs = spread(load(spark, sf_dir, "documents").select("source", "text"))
    tk = docs.select("source", tokens(F.col("text")).alias("tk"))
    pairs = tk.select(
        "source",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tk"), 1, F.greatest(F.size("tk") - 1, F.lit(0))),
                F.slice(F.col("tk"), 2, F.greatest(F.size("tk") - 1, F.lit(0))),
            )
        ).alias("p"),
    ).select("source", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    # SIX consumers (ptype + 5 reference tables) — pin the pair stream
    # once or the tokenize/explode pass re-runs per consumer (the
    # ppl_perdoc convention, curation6.py).
    pairs = materialize(pairs, "doremi-pairs")
    ptype = pairs.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    ref = pairs.where(F.col("source") == _PPL_REF_SOURCE)
    refp = ref.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    refu = ref.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("cu"))
    reft = (
        ref.groupBy(F.col("w2").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    refn = ref.agg(F.count(F.lit(1)).cast("long").alias("nref"))
    vocab = (
        ref.select(F.col("w1").alias("t"))
        .union(ref.select(F.col("w2").alias("t")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    lpb = F.round(
        F.log(
            (F.coalesce(F.col("cb"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v"))
        ),
        6,
    ).cast("decimal(18,6)")
    lpu = F.round(
        F.log(
            (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
            / (F.col("nref") + F.col("v"))
        ),
        6,
    ).cast("decimal(18,6)")
    scored = (
        ptype.join(refp, ["w1", "w2"], "left")
        .join(refu, ["w1"], "left")
        .join(reft, ptype["w2"] == reft["t"], "left")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(refn))
        .select("source", "m", lpb.alias("lpb"), lpu.alias("lpu"))
    )
    persrc = scored.groupBy("source").agg(
        F.sum("m").cast("long").alias("n_pairs"),
        F.round(
            -F.sum(F.col("lpb") * F.col("m")).cast("double")
            / F.sum("m").cast("double"),
            6,
        ).alias("h_bigram"),
        F.round(
            -F.sum(F.col("lpu") * F.col("m")).cast("double")
            / F.sum("m").cast("double"),
            6,
        ).alias("h_unigram"),
    )
    ex = persrc.select(
        "source",
        "n_pairs",
        "h_bigram",
        "h_unigram",
        F.greatest(
            F.lit(0),
            F.round(F.col("h_unigram") * 1e6).cast("long")
            - F.round(F.col("h_bigram") * 1e6).cast("long"),
        ).alias("excess_fp6"),
    )
    tot = ex.agg(F.sum("excess_fp6").cast("long").alias("te"))
    weight = F.when(
        F.col("te") > 0,
        F.expr("(2000000 * excess_fp6 + te) div (2 * te)"),
    ).otherwise(F.lit(0))
    return (
        ex.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_pairs",
            "h_bigram",
            "h_unigram",
            "excess_fp6",
            weight.cast("long").alias("weight_ppm"),
        )
        .orderBy("source")
    )

"""Round-10 curation analytics, tranche 2: cross-source contamination,
dedup threshold sensitivity, vocabulary profiles, and the perplexity
filter curve.

* ``docs_cross_source_contamination_matrix`` — for every source pair,
  the shared distinct 3-gram shingles and the overlap coefficient
  (shared / min(|A|, |B|)) in exact ppm: the WIMBD-style readout that
  says which sources to cross-deduplicate before mixing them into a
  training set.
* ``docs_near_dup_threshold_sensitivity`` — the dedup tuning curve:
  over the LSH candidate pairs, EXACT shingle Jaccard is computed once
  and swept over thresholds 40..90% with integer cross-multiplied
  tests (inter * 100 >= t * union — no division, no doubles), emitting
  pair counts and affected-doc counts per threshold.  The shipped
  near-dup pipeline's 0.7 point sits on this curve.
* ``text_vocabulary_profile_by_source`` — per source: token count,
  vocabulary size, hapax legomena, type-token ratio and hapax share in
  exact ppm — the Heaps/Zipf-adjacent corpus health profile.
* ``docs_perplexity_filter_curve`` — the CCNet-style filter tuned: the
  per-document bigram-LM perplexity (same add-1 reference model as
  ``text_lm_perplexity_vs_reference``) swept over keep cutoffts,
  emitting docs/tokens kept per cutoff.  Cutoffs compare the rounded
  per-doc cross-entropy h against ln(cutoff) so the gate is exact on
  both engines.

100 TB shape: everything rides wordcount-shaped shuffles (shingle /
token / pair-type counts); the contamination matrix's self-join fans
each shingle hash to at most C(#sources, 2) rows (source-count-, not
corpus-, bounded); the sensitivity curve touches only LSH candidates;
the perplexity model tables are vocab²-bounded broadcasts.  Outputs
are source-pair / threshold / source-sized frames.

Reference parity note: the reference engine has no text surface
(SURVEY §2); these extend the curation pack (plans/curation*.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import sql_normalize_text, tokens
from event_streaming_spark.operators import similarity as S
from event_streaming_spark.operators.materialize import materialize
from event_streaming_spark.plans.catalog import load, register, spread

# ---------------------------------------------------------------------------
# Cross-source contamination matrix.
# ---------------------------------------------------------------------------

_XSRC_ORACLE = f"""
WITH sh AS MATERIALIZED (
  SELECT DISTINCT source, h FROM (
    SELECT source, unnest({S.sql_shingle_hashes('text')}) AS h FROM documents)
), tot AS MATERIALIZED (
  SELECT source, cast(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY source
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         cast(count(*) AS BIGINT) AS n_shared
  FROM sh a JOIN sh b ON b.h = a.h AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s.source_a, s.source_b, s.n_shared,
       ta.n_sh AS n_a, tb.n_sh AS n_b,
       cast(s.n_shared * 1000000 // least(ta.n_sh, tb.n_sh) AS BIGINT)
         AS overlap_ppm
FROM shared s
JOIN tot ta ON ta.source = s.source_a
JOIN tot tb ON tb.source = s.source_b
ORDER BY source_a, source_b
"""


@register(
    "docs_cross_source_contamination_matrix",
    _XSRC_ORACLE,
    tags=("llm", "dedup", "curation", "audit"),
)
def docs_cross_source_contamination_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shared distinct shingles + overlap coefficient per source pair.

    Scale design: the (source, h) table is distinct-deduped before the
    self-join, so each hash fans out to at most C(#sources, 2) pairs —
    a constant multiplier, never a doc-pair explosion; per-source
    totals are a wordcount aggregate joined back on the tiny
    source-pair frame.
    """
    docs = spread(load(spark, sf_dir, "documents").select("source", "text"))
    sh = materialize(
        docs.select(
            "source", F.explode(S.shingle_hashes(F.col("text"))).alias("h")
        ).distinct(),
        name="xsrc-shingles",
    )
    tot = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = sh.select(F.col("source").alias("source_a"), "h")
    b = sh.select(F.col("source").alias("source_b"), "h")
    shared = (
        a.join(b, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("n_sh").alias("n_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr(
                "(n_shared * CAST(1000000 AS BIGINT)) div least(n_a, n_b)"
            )
            .cast("long")
            .alias("overlap_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Near-dup threshold sensitivity.
# ---------------------------------------------------------------------------

_NDT_THRESHOLDS = (40, 50, 60, 70, 80, 90)  # Jaccard * 100


def _ndt_oracle() -> str:
    from event_streaming_spark.plans.llm_similarity import _LSH_ORACLE

    vals = ", ".join(f"({t})" for t in _NDT_THRESHOLDS)
    return f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, unnest({S.sql_shingle_hashes('text')}) AS h FROM documents
), nsh AS MATERIALIZED (
  SELECT doc_id, cast(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
), cand AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({_LSH_ORACLE}) x
), inter AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b, cast(count(*) AS BIGINT) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.h = a.h
  GROUP BY c.doc_a, c.doc_b
), jac AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b,
         coalesce(i.i, 0) AS inter,
         na.n + nb.n - coalesce(i.i, 0) AS un
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN nsh na ON na.doc_id = c.doc_a
  JOIN nsh nb ON nb.doc_id = c.doc_b
)
SELECT cast(t.thr AS BIGINT) AS threshold_pct,
       cast(count(*) FILTER (WHERE inter * 100 >= cast(t.thr AS BIGINT) * un)
            AS BIGINT) AS n_pairs,
       cast(count(DISTINCT CASE WHEN inter * 100 >= cast(t.thr AS BIGINT) * un
                                THEN doc_a END)
            + count(DISTINCT CASE WHEN inter * 100 >= cast(t.thr AS BIGINT) * un
                                  THEN doc_b END) AS BIGINT) AS n_doc_slots
FROM jac, (VALUES {vals}) t(thr)
GROUP BY t.thr
ORDER BY threshold_pct
"""


@register(
    "docs_near_dup_threshold_sensitivity",
    _ndt_oracle(),
    tags=("llm", "dedup", "lsh", "tuning"),
)
def docs_near_dup_threshold_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-Jaccard pair counts per dedup threshold over the LSH
    candidates.

    Scale design: exact Jaccard is computed ONCE per candidate pair
    (the LSH band join bounds candidates; the intersection is an
    equi-join of the two endpoints' shingle rows on h, never a
    cross-join); the six thresholds are integer cross-multiplied
    conditional counts over the candidate-sized frame — no rescoring
    per threshold.  ``n_doc_slots`` counts distinct left + distinct
    right endpoints (the dedup workload estimate).
    """
    from event_streaming_spark.plans.llm_similarity import (
        minhash_lsh_near_dup_pairs,
    )

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = materialize(
        docs.select(
            "doc_id", F.explode(S.shingle_hashes(F.col("text"))).alias("h")
        ),
        name="ndt-shingles",
    )
    nsh = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cand = minhash_lsh_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sha = sh.select(F.col("doc_id").alias("doc_a"), "h")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    na = nsh.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = nsh.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("i", F.lit(0)).cast("long").alias("inter"),
            (F.col("na") + F.col("nb") - F.coalesce("i", F.lit(0)))
            .cast("long")
            .alias("un"),
        )
    )
    thr = F.explode(
        F.array(*[F.lit(t).cast("long") for t in _NDT_THRESHOLDS])
    ).alias("thr")
    fanned = jac.select("*", thr)
    keep = F.col("inter") * 100 >= F.col("thr") * F.col("un")
    return (
        fanned.groupBy("thr")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_pairs"),
            (
                F.countDistinct(F.when(keep, F.col("doc_a")))
                + F.countDistinct(F.when(keep, F.col("doc_b")))
            )
            .cast("long")
            .alias("n_doc_slots"),
        )
        .select(
            F.col("thr").alias("threshold_pct"), "n_pairs", "n_doc_slots"
        )
        .orderBy("threshold_pct")
    )


# ---------------------------------------------------------------------------
# Vocabulary profile per source.
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = f"""
WITH wc AS MATERIALIZED (
  SELECT source, w, cast(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split({sql_normalize_text('text')}, ' ')) AS w
        FROM documents)
  GROUP BY source, w
)
SELECT source,
       cast(sum(c) AS BIGINT) AS n_tokens,
       cast(count(*) AS BIGINT) AS vocab,
       cast(count(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax,
       cast(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_ppm,
       cast(count(*) FILTER (WHERE c = 1) * 1000000 // count(*) AS BIGINT)
         AS hapax_ppm
FROM wc GROUP BY source ORDER BY source
"""


@register(
    "text_vocabulary_profile_by_source",
    _VOCAB_ORACLE,
    tags=("llm", "text", "stats"),
)
def text_vocabulary_profile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count, vocabulary, hapax legomena, TTR per source — one
    wordcount shuffle feeding a source-sized rollup."""
    docs = spread(load(spark, sf_dir, "documents").select("source", "text"))
    wc = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
    return (
        wc.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            hapax.alias("hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab",
            "hapax",
            F.expr("(vocab * CAST(1000000 AS BIGINT)) div n_tokens")
            .cast("long")
            .alias("ttr_ppm"),
            F.expr("(hapax * CAST(1000000 AS BIGINT)) div vocab")
            .cast("long")
            .alias("hapax_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Perplexity filter curve (per-doc CCNet gate).
# ---------------------------------------------------------------------------

_PPL_CUTOFFS = (5, 10, 15, 20, 30)
_PPL_REF_SOURCE = "src0"  # same reference slice as text_lm_perplexity_vs_reference


# Shared CTE prefix: tokenized bigram pairs -> per-doc add-1 bigram
# cross-entropy h.  Used by the filter curve here and the CCNet-style
# head/middle/tail bucket query (curation7) — ONE definition keeps the
# rounded-double h identical everywhere it is hash-gated.
PPL_CORE_CTES = f"""pairs AS MATERIALIZED (
  SELECT doc_id, source,
         unnest(tk[1:len(tk)-1]) AS w1,
         unnest(tk[2:len(tk)]) AS w2
  FROM (SELECT doc_id, source,
               string_split({sql_normalize_text('text')}, ' ') AS tk
        FROM documents)
), ptype AS MATERIALIZED (
  SELECT doc_id, w1, w2, cast(count(*) AS BIGINT) AS m
  FROM pairs GROUP BY doc_id, w1, w2
), refp AS MATERIALIZED (
  SELECT w1, w2, cast(count(*) AS BIGINT) AS cb
  FROM pairs WHERE source = '{_PPL_REF_SOURCE}' GROUP BY w1, w2
), refu AS MATERIALIZED (
  SELECT w1, cast(count(*) AS BIGINT) AS cu
  FROM pairs WHERE source = '{_PPL_REF_SOURCE}' GROUP BY w1
), vocab AS (
  SELECT cast(count(DISTINCT t) AS BIGINT) AS v FROM (
    SELECT w1 AS t FROM pairs WHERE source = '{_PPL_REF_SOURCE}'
    UNION SELECT w2 FROM pairs WHERE source = '{_PPL_REF_SOURCE}')
), scored AS MATERIALIZED (
  SELECT p.doc_id, p.m,
         cast(round(ln((coalesce(r.cb, 0) + 1.0)
                       / (coalesce(u.cu, 0) + vocab.v)), 6)
              AS DECIMAL(18,6)) AS lp
  FROM ptype p
  LEFT JOIN refp r ON r.w1 = p.w1 AND r.w2 = p.w2
  LEFT JOIN refu u ON u.w1 = p.w1
  CROSS JOIN vocab
), perdoc AS MATERIALIZED (
  SELECT doc_id, cast(sum(m) AS BIGINT) AS n_pairs,
         round(-cast(sum(lp * m) AS DOUBLE) / cast(sum(m) AS DOUBLE), 6) AS h
  FROM scored GROUP BY doc_id
)"""


def ppl_perdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_pairs, h): per-document add-1 bigram cross-entropy
    against the `_PPL_REF_SOURCE` reference LM — the Spark twin of
    `PPL_CORE_CTES`, factored so every consumer shares ONE definition
    of the rounded-double h (moved verbatim from the filter curve)."""
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
        .select("doc_id", "source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    pairs = materialize(pairs, "pplcurve-pairs")
    ptype = pairs.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    ref = pairs.where(F.col("source") == _PPL_REF_SOURCE)
    refp = ref.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    refu = ref.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("cu"))
    vocab = (
        ref.select(F.col("w1").alias("t"))
        .union(ref.select(F.col("w2").alias("t")))
        .agg(F.countDistinct("t").cast("long").alias("v"))
    )
    scored = (
        # refp (reference bigrams) is corpus-dependent — it can far
        # exceed vocabulary size — and refu is vocabulary-scale, so no
        # forced broadcast on either: AQE decides from measured sizes.
        # Only the 1-row `vocab` scalar keeps the broadcast hint.
        ptype.join(refp, ["w1", "w2"], "left")
        .join(refu, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "m",
            F.round(
                F.log(
                    (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("m").cast("long").alias("n_pairs"),
        F.round(
            -F.sum(F.col("lp") * F.col("m")).cast("double")
            / F.sum("m").cast("double"),
            6,
        ).alias("h"),
    )


def _ppl_oracle() -> str:
    cuts = ", ".join(f"({c}, {math.log(c)!r})" for c in _PPL_CUTOFFS)
    return f"""
WITH {PPL_CORE_CTES}, tot AS (
  SELECT cast(count(*) AS BIGINT) AS n_docs,
         cast(sum(n_pairs) AS BIGINT) AS n_pairs_tot
  FROM perdoc
)
SELECT cast(c.cutoff AS BIGINT) AS ppl_cutoff,
       cast(count(*) FILTER (WHERE p.h <= c.lnc) AS BIGINT) AS n_docs_kept,
       cast(coalesce(sum(p.n_pairs) FILTER (WHERE p.h <= c.lnc), 0) AS BIGINT)
         AS pairs_kept,
       cast(count(*) FILTER (WHERE p.h <= c.lnc) * 1000000 // t.n_docs
            AS BIGINT) AS keep_ppm
FROM perdoc p, (VALUES {cuts}) c(cutoff, lnc), tot t
GROUP BY c.cutoff, t.n_docs
ORDER BY ppl_cutoff
"""


@register(
    "docs_perplexity_filter_curve",
    _ppl_oracle(),
    tags=("llm", "text", "quality", "tuning"),
)
def docs_perplexity_filter_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs/tokens kept per perplexity cutoff under the add-1 bigram
    reference LM (CCNet-style filter, tuned instead of asserted).

    Scale design: one tokenize pass feeds the per-doc pair-TYPE counts
    and the vocab-bounded reference model (broadcast joins); the gate
    compares the 6dp-rounded per-doc cross-entropy h against ln(cutoff)
    literals, so the sweep is conditional sums over the doc-sized
    frame — no exp(), no per-cutoff rescoring.  Docs with < 2 tokens
    have no bigrams and are outside the scored population (the same
    contract as the per-source perplexity query).
    """
    perdoc = ppl_perdoc(spark, sf_dir)
    tot = perdoc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_pairs").cast("long").alias("n_pairs_tot"),
    ).coalesce(1)
    cut = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).cast("long").alias("cutoff"),
                    F.lit(math.log(c)).alias("lnc"),
                )
                for c in _PPL_CUTOFFS
            ]
        )
    ).alias("c")
    fanned = perdoc.select("*", cut).crossJoin(F.broadcast(tot))
    keep = F.col("h") <= F.col("c.lnc")
    return (
        fanned.groupBy("c.cutoff", "n_docs")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_docs_kept"),
            F.coalesce(F.sum(F.when(keep, F.col("n_pairs"))), F.lit(0))
            .cast("long")
            .alias("pairs_kept"),
        )
        .select(
            F.col("cutoff").alias("ppl_cutoff"),
            "n_docs_kept",
            "pairs_kept",
            F.expr(
                "(n_docs_kept * CAST(1000000 AS BIGINT)) div n_docs"
            )
            .cast("long")
            .alias("keep_ppm"),
        )
        .orderBy("ppl_cutoff")
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between source unigram distributions — the
# distributional companion to the shingle-overlap contamination matrix
# above: overlap says "these sources share text"; JS says "these
# sources are the same KIND of text".  Both feed the mixing decision.
#
# Decomposition that needs only the SHARED-word equi-join (never a
# per-pair full outer): for words in A∩B the contribution is
# pa·ln(2pa/(pa+pb)); for words only in A it collapses to pa·ln2, and
# Σ_{A\B} pa = 1 − Σ_{A∩B} pa — so exclusive mass falls out of the
# shared sums.  2pa/(pa+pb) = 2·ca·nb / (ca·nb + cb·na) is an EXACT
# integer ratio; each term is rounded to DECIMAL(18,9) before the sum
# (the order-independent lp convention from the LM queries), and the
# final assembly is one fixed-shape double expression rounded at 6dp.
# ---------------------------------------------------------------------------

_JS_ORACLE = f"""
WITH wc AS MATERIALIZED (
  SELECT source, w, cast(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split({sql_normalize_text('text')}, ' ')) AS w
        FROM documents)
  GROUP BY source, w
), tot AS MATERIALIZED (
  SELECT source, cast(sum(c) AS BIGINT) AS n FROM wc GROUP BY source
), shared AS MATERIALIZED (
  SELECT a.source AS source_a, b.source AS source_b,
         a.c AS ca, b.c AS cb, ta.n AS na, tb.n AS nb
  FROM wc a
  JOIN wc b ON b.w = a.w AND a.source < b.source
  JOIN tot ta ON ta.source = a.source
  JOIN tot tb ON tb.source = b.source
), sums AS (
  SELECT source_a, source_b,
         cast(count(*) AS BIGINT) AS n_shared_words,
         cast(sum(ca) AS BIGINT) AS ca_shared,
         cast(sum(cb) AS BIGINT) AS cb_shared,
         sum(cast(round((cast(ca AS DOUBLE) / cast(na AS DOUBLE))
               * ln(cast(2 * ca * nb AS DOUBLE)
                    / cast(ca * nb + cb * na AS DOUBLE)), 9)
             AS DECIMAL(18,9))) AS s_a,
         sum(cast(round((cast(cb AS DOUBLE) / cast(nb AS DOUBLE))
               * ln(cast(2 * cb * na AS DOUBLE)
                    / cast(ca * nb + cb * na AS DOUBLE)), 9)
             AS DECIMAL(18,9))) AS s_b,
         max(na) AS na, max(nb) AS nb
  FROM shared GROUP BY source_a, source_b
)
SELECT source_a, source_b, n_shared_words,
       round(0.5 * (cast(s_a AS DOUBLE)
                    + ln(2) * (1.0 - cast(ca_shared AS DOUBLE) / cast(na AS DOUBLE)))
             + 0.5 * (cast(s_b AS DOUBLE)
                    + ln(2) * (1.0 - cast(cb_shared AS DOUBLE) / cast(nb AS DOUBLE))),
             6) AS js_divergence
FROM sums
ORDER BY source_a, source_b
"""


@register(
    "text_js_divergence_between_sources",
    _JS_ORACLE,
    tags=("llm", "text", "stats", "curation"),
)
def text_js_divergence_between_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence of source unigram
    distributions (see the decomposition note above).

    Pairs sharing NO words carry no join rows and are omitted — their
    JS is the trivial maximum ln 2; the matrix lists interacting pairs
    only (identical join-driven behaviour on both engines, pinned by
    tests/test_r10_ops.py).

    Scale design: one wordcount shuffle; the pair join is on the WORD
    key (each word fans to at most C(#sources, 2) pairs); per-term
    DECIMAL(18,9) rounding before the keyed sum keeps the reduction
    order-independent; exclusive-mass terms come from the shared sums,
    so no full-outer join and no second corpus pass exist.
    """
    docs = spread(load(spark, sf_dir, "documents").select("source", "text"))
    wc = materialize(
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c")),
        name="js-wordcounts",
    )
    tot = wc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = wc.select(F.col("source").alias("source_a"), "w", F.col("c").alias("ca"))
    b = wc.select(F.col("source").alias("source_b"), "w", F.col("c").alias("cb"))
    ta = tot.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    shared = (
        a.join(b, "w")
        .where(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
    )
    term = lambda cx, nx, cy, ny: F.round(  # noqa: E731 - local formula alias
        (F.col(cx).cast("double") / F.col(nx).cast("double"))
        * F.log(
            (2 * F.col(cx) * F.col(ny)).cast("double")
            / (F.col("ca") * F.col("nb") + F.col("cb") * F.col("na")).cast("double")
        ),
        9,
    ).cast("decimal(18,9)")
    sums = shared.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_words"),
        F.sum("ca").cast("long").alias("ca_shared"),
        F.sum("cb").cast("long").alias("cb_shared"),
        F.sum(term("ca", "na", "cb", "nb")).alias("s_a"),
        F.sum(term("cb", "nb", "ca", "na")).alias("s_b"),
        F.max("na").cast("long").alias("na"),
        F.max("nb").cast("long").alias("nb"),
    )
    ln2 = F.lit(math.log(2.0))
    return sums.select(
        "source_a",
        "source_b",
        "n_shared_words",
        F.round(
            F.lit(0.5)
            * (
                F.col("s_a").cast("double")
                + ln2
                * (
                    F.lit(1.0)
                    - F.col("ca_shared").cast("double") / F.col("na").cast("double")
                )
            )
            + F.lit(0.5)
            * (
                F.col("s_b").cast("double")
                + ln2
                * (
                    F.lit(1.0)
                    - F.col("cb_shared").cast("double") / F.col("nb").cast("double")
                )
            ),
            6,
        ).alias("js_divergence"),
    ).orderBy("source_a", "source_b")

"""LLM training-data text-analysis queries over ``documents`` (SURVEY §2.5).

Each query pairs the JVM-side operator from operators/text.py with an
oracle generated from the SAME constants/expression builders, so engine
and oracle cannot drift.

Scale: every operator here is a stateless projection — pipelines into the
scan, no shuffle (exact dedup being the one hash-shuffle, on the digest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import normalize_text, sql_normalize_text
from event_streaming_spark.operators import text as T
from event_streaming_spark.plans.catalog import load, register, spread

# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

_TOKENS_ORACLE = f"""
SELECT doc_id,
       {T.sql_ws_token_count('text')} AS n_ws_tokens,
       {T.sql_bpe_token_count('text')} AS n_bpe_tokens,
       len(text) AS n_chars_actual,
       n_chars AS n_chars_declared
FROM documents
"""


@register("text_token_counts", _TOKENS_ORACLE, tags=("llm", "text"), bench=True)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.ws_token_count(F.col("text")).alias("n_ws_tokens"),
        T.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.col("n_chars").alias("n_chars_declared"),
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_QF = T.sql_quality_features("text")
_QUALITY_ORACLE = f"""
SELECT doc_id,
       {_QF['alpha_ratio']} AS alpha_ratio,
       {_QF['stopword_ratio']} AS stopword_ratio,
       {_QF['mean_token_len']} AS mean_token_len,
       {_QF['n_tokens']} AS n_tokens
FROM documents
"""


@register("text_quality_features", _QUALITY_ORACLE, tags=("llm", "text"))
def text_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    feats = T.quality_features(F.col("text"))
    return docs.select(
        "doc_id", *[feats[k].alias(k) for k in ("alpha_ratio", "stopword_ratio", "mean_token_len", "n_tokens")]
    )


# ---------------------------------------------------------------------------
# language identification (marker-word heuristic) + accuracy vs declared lang
# ---------------------------------------------------------------------------

_LANGID_ORACLE = f"""
SELECT predicted_lang, count(*) AS n_docs
FROM (SELECT {T.sql_lang_id('text')} AS predicted_lang FROM documents)
GROUP BY predicted_lang
"""


@register("text_lang_id_distribution", _LANGID_ORACLE, tags=("llm", "text"))
def text_lang_id_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    return (
        docs.select(T.lang_id(F.col("text")).alias("predicted_lang"))
        .groupBy("predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# document fingerprinting: whole-doc md5 + simhash
# ---------------------------------------------------------------------------

_FP_ORACLE = f"""
WITH staged AS (
  SELECT doc_id, {T.sql_content_md5('text')} AS content_md5,
         {T.sql_token_hashes('text')} AS hs
  FROM documents
)
SELECT doc_id, content_md5, {T.sql_simhash_over('hs')} AS simhash32
FROM staged
"""


@register("text_fingerprints", _FP_ORACLE, tags=("llm", "text", "hash"))
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.content_md5(F.col("text")).alias("content_md5"),
        T.simhash(F.col("text")).alias("simhash32"),
    )


# ---------------------------------------------------------------------------
# exact dedup (SURVEY §2.5 row 1): sha256 over normalized text; one row per
# distinct digest with copy count + canonical representative (min doc_id).
# Scale: map-side partial agg → one shuffle on digest; this is THE pattern
# for exact dedup at 100 TB (no sort, no window).
# ---------------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = f"""
SELECT sha256({sql_normalize_text('text')}) AS digest,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


@register("dedup_exact_sha256", _EXACT_DEDUP_ORACLE, tags=("llm", "dedup"), bench=True)
def dedup_exact_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    return (
        docs.select(F.sha2(normalize_text(F.col("text")), 256).alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# TF-IDF term scoring (SURVEY §2.5 "text analysis": the HashingTF/IDF idea
# as explicit, oracle-checkable relational algebra).  Two aggregation
# passes: document frequency per term, then global tf·idf.
# Scale: explode(tokens) is the classic text inversion — shuffle on term;
# at 100 TB this is the inverted-index build, partial-agg-friendly.
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({sql_normalize_text('text')}, ' ')) AS term
  FROM documents
), tf AS (
  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
  FROM toks GROUP BY term
), n AS (SELECT count(*) AS n_docs FROM documents)
SELECT term, tf, df,
       round(tf * ln(cast(n_docs as double) / df), 6) AS tfidf
FROM tf, n
ORDER BY tfidf DESC, term
LIMIT 25
"""


@register("text_tfidf_top_terms", _TFIDF_ORACLE, tags=("llm", "text", "agg"))
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.hashing import tokens as tok_fn

    docs = spread(load(spark, sf_dir, "documents"))
    n_docs = docs.count()  # scalar dimension, computed once (cheap metadata agg)
    toks = docs.select("doc_id", F.explode(tok_fn(F.col("text"))).alias("term"))
    tf = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df")
    )
    return (
        tf.select(
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), F.asc("term"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing under the correctness gate: opaque BINARY column
# (synthesized from text here — the fixtures carry no media), typed
# metadata extracted relationally: byte length, hex prefix, text checksum.
# The codec-level operators live in operators/multimodal.py (mapInPandas).
# ---------------------------------------------------------------------------

_BINARY_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       lower(hex(encode(substr(text, 1, 8)))) AS prefix_hex,
       md5(text) AS text_md5
FROM documents
WHERE doc_id < 100
"""


@register("binary_column_metadata", _BINARY_ORACLE, tags=("llm", "multimodal", "binary"))
def binary_column_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    bin_col = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.length(bin_col).alias("n_bytes"),
        F.lower(F.hex(F.substring(bin_col, 1, 8))).alias("prefix_hex"),
        F.md5(F.col("text")).alias("text_md5"),
    )


# ---------------------------------------------------------------------------
# Per-source heavy hitters: each source's 5 most frequent tokens with a
# deterministic tie-break — the "what is this corpus made of" audit run
# per ingest source (boilerplate tokens dominating a source is the usual
# tell for markup leakage).  Scale: the wordcount aggregate combines
# map-side (shuffle carries distinct (source, term) partials, not token
# occurrences); the rank window partitions by source over the per-source
# VOCABULARY (bounded, unlike the corpus), so no global ordering and no
# single-partition stage.  At extreme vocabularies, swap the exact rank
# for a count-min/SpaceSaving sketch and keep the same output contract.
# ---------------------------------------------------------------------------

_HH_ORACLE = f"""
WITH t AS (
  SELECT source, unnest(string_split({sql_normalize_text('text')}, ' ')) AS term
  FROM documents
), c AS (
  SELECT source, term, count(*) AS n FROM t GROUP BY 1, 2
), r AS (
  SELECT source, term, n,
         row_number() OVER (PARTITION BY source ORDER BY n DESC, term) AS rnk
  FROM c
)
SELECT source, term, n, rnk FROM r WHERE rnk <= 5
"""


@register("text_heavy_hitters_per_source", _HH_ORACLE, tags=("llm", "text", "agg", "window"))
def text_heavy_hitters_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.hashing import tokens as tok_fn

    docs = spread(load(spark, sf_dir, "documents"))
    counts = (
        docs.select("source", F.explode(tok_fn(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # two-stage top-k (operators/ranks.py): per-source distinct terms
    # scale with vocabulary (~zipf, still 10^8-ish at corpus scale) —
    # a bare per-source window is one task per source.
    from event_streaming_spark.operators.ranks import topk_per_group

    return topk_per_group(
        counts, "source", [F.col("n").desc(), F.col("term")], 5, rn_col="rnk"
    ).select("source", "term", "n", "rnk")


# ---------------------------------------------------------------------------
# Heavy hitters via Misra-Gries candidates + EXACT rescan — the concrete
# scale path the exact query's docstring promises "at extreme
# vocabularies": pass 1 runs a capacity-C Misra-Gries summary PER
# PARTITION per source (Arrow-batched, state bounded at C counters per
# source per partition — never the vocabulary), pass 2 rescans the
# stream counting ONLY the candidate terms exactly.  The shuffle carries
# |candidates| ≤ partitions×C×|sources| rows instead of the full
# per-source vocabulary — the win when distinct terms (10⁸-ish at corpus
# scale) dwarf C.
#
# Correctness is PROVEN per run, not hoped: summed across partitions the
# MG decrement mass is ≤ N_source/(C+1), so every term with global count
# > N_source/(C+1) survives in ≥1 partition (pigeonhole).  The plan
# asserts min(top-5 exact count) > N_source/(C+1) for every source and
# raises otherwise — so when the query RETURNS, its output provably
# equals the exact top-5 (same oracle as text_heavy_hitters_per_source),
# and on a corpus too flat for the capacity it fails loudly instead of
# silently approximating.
# ---------------------------------------------------------------------------

_MG_CAPACITY = 256


@register(
    "text_heavy_hitters_mg_rescan",
    _HH_ORACLE,
    tags=("llm", "text", "sketch", "agg"),
    bench=True,  # r8: heaviest r7 addition — tracked round-over-round
)
def text_heavy_hitters_mg_rescan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.hashing import tokens as tok_fn
    from event_streaming_spark.operators.ranks import topk_per_group

    docs = spread(load(spark, sf_dir, "documents"))
    stream = docs.select("source", F.explode(tok_fn(F.col("text"))).alias("term"))

    cap = _MG_CAPACITY

    def mg_partition(batches):
        # Misra-Gries per source over THIS partition's token stream.
        # Batched decrement: when a source exceeds `cap` counters,
        # subtract the (cap+1)-th largest count from all and drop ≤0 —
        # the merge form of the classic one-at-a-time decrement, same
        # ≤ n_p/(cap+1) error mass.  Besides candidate rows (np NULL)
        # each partition emits ONE marker row per source (term NULL,
        # np = this partition's token count for the source): summed,
        # the markers give N_source for the completeness proof without
        # a third scan of the stream.
        from collections import Counter, defaultdict

        import pandas as pd

        state: dict = defaultdict(Counter)
        seen: Counter = Counter()
        for pdf in batches:
            seen.update(pdf.groupby("source").size().to_dict())
            for src, cnt in pdf.groupby("source")["term"].value_counts().groupby(
                level=0
            ):
                c = state[src]
                c.update({t: int(n) for (_, t), n in cnt.items()})
                if len(c) > cap:
                    kth = sorted(c.values(), reverse=True)[cap]
                    state[src] = Counter(
                        {t: n - kth for t, n in c.items() if n - kth > 0}
                    )
        rows = [(s, t, None) for s, cn in state.items() for t in cn] + [
            (s, None, int(n)) for s, n in seen.items()
        ]
        out = pd.DataFrame(rows or None, columns=["source", "term", "np"])
        out["np"] = out["np"].astype("Int64")
        yield out

    # ONE scan of the stream produces both the candidate set and the
    # per-source totals; the tiny summary (≤ partitions×(cap+1) rows per
    # source) is cached so reading the two legs never re-runs the pass.
    summary = stream.mapInPandas(
        mg_partition, "source string, term string, np long"
    ).cache()
    cand = (
        summary.where(F.col("term").isNotNull())
        .select("source", "term")
        .dropDuplicates(["source", "term"])
    )

    # pass 2: EXACT counts of candidates only (the join keeps the shuffle
    # candidate-sized; AQE broadcasts the small side)
    exact = (
        stream.join(cand, ["source", "term"])
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Pinned via the materializer, NOT .cache(): a leaked cache entry is
    # plan-matched by the NEXT invocation's identical plan, so repeated
    # runs in one session silently skip the work (and accumulate cache
    # entries) — VERDICT r11 #2 cache-hygiene item.  The checkpoint pins
    # the rows for the proof collect below and the caller alike, and a
    # fresh invocation always recomputes.
    from event_streaming_spark.operators.materialize import materialize

    top = materialize(
        topk_per_group(
            exact, "source", [F.col("n").desc(), F.col("term")], 5, rn_col="rnk"
        ).select("source", "term", "n", "rnk"),
        "mg-top",
    )

    # completeness proof: min top-5 exact count must clear the MG survival
    # bound N_source/(cap+1).  Totals come from the pass-1 markers (no
    # extra stream scan) and floors from ONE collect of the cached top
    # (≤ 5×#sources rows; the caller's own collect reuses the cache).
    totals = {
        r["source"]: r["N"]
        for r in summary.where(F.col("term").isNull())
        .groupBy("source")
        .agg(F.sum("np").alias("N"))
        .collect()
    }
    floors: dict = {}
    for r in top.collect():
        s = r["source"]
        floors[s] = min(floors.get(s, r["n"]), r["n"])
    thin = {
        s: (floors.get(s, 0), totals[s] // (cap + 1))
        for s in totals
        if floors.get(s, 0) <= totals[s] / (cap + 1)
    }
    if thin:  # -O-safe
        raise AssertionError(
            f"MG capacity {cap} cannot prove top-5 completeness for {thin}; "
            "raise _MG_CAPACITY"
        )
    # top is checkpoint-pinned (computed above) for the caller; the
    # pass-1 summary served both legs and can release its executors'
    # memory now.
    summary.unpersist()
    return top


# ---------------------------------------------------------------------------
# Model-based quality GATE: a linear scorer with SHIPPED integer weights
# over exact-integer features — the "quality classifier filter" stage of
# a training-data pipeline (fasttext-style), reduced to arithmetic both
# engines compute bit-identically: every feature is an integer
# numerator/denominator pair and every ratio a ppm floor division, so
# the score (and the keep decision) cannot drift across engines the way
# a float dot product + sigmoid would.  Weights favor alphabetic prose
# with English stopword density and moderate token length; the
# threshold keeps roughly the top half of the synthetic corpus.
# ---------------------------------------------------------------------------

_QGATE_THRESHOLD = 3_900_000

_QGATE_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS a,
         len(text) AS c,
         list_filter(string_split({T.sql_normalize_text('text')}, ' '),
                     t -> t <> '') AS toks
  FROM documents
  WHERE len(text) > 0
), g AS (
  SELECT doc_id, a, c,
         len(toks) AS t,
         len(list_filter(toks, t -> list_contains([{', '.join(f"'{w}'" for w in T.ENGLISH_STOPWORDS)}], t))) AS s,
         list_sum(list_transform(toks, t -> len(t))) AS big_l
  FROM f
)
SELECT doc_id,
       cast(3 * ((a * 1000000) // c)
          + 5 * ((s * 1000000) // t)
          + 2 * ((big_l * 1000000) // (t * 8)) AS BIGINT) AS score_fp,
       CASE WHEN 3 * ((a * 1000000) // c)
               + 5 * ((s * 1000000) // t)
               + 2 * ((big_l * 1000000) // (t * 8)) >= {_QGATE_THRESHOLD}
            THEN 1 ELSE 0 END AS kept
FROM g
WHERE t > 0
ORDER BY doc_id
"""


@register(
    "text_quality_model_gate",
    _QGATE_ORACLE,
    tags=("llm", "text", "quality"),
)
def text_quality_model_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.hashing import tokens

    docs = spread(load(spark, sf_dir, "documents")).where(F.length("text") > 0)
    toks = tokens(F.col("text"))
    g = docs.select(
        "doc_id",
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("a"),
        F.length("text").alias("c"),
        F.size(toks).alias("t"),
        F.size(F.filter(toks, lambda x: x.isin(*T.ENGLISH_STOPWORDS))).alias("s"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).alias(
            "big_l"
        ),
    ).where(F.col("t") > 0)
    score = F.expr(
        "3 * ((a * 1000000) div c)"
        " + 5 * ((s * 1000000) div t)"
        " + 2 * ((big_l * 1000000) div (t * 8))"
    ).cast("bigint")
    return (
        g.withColumn("score_fp", score)
        .withColumn(
            "kept",
            F.when(F.col("score_fp") >= _QGATE_THRESHOLD, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .select("doc_id", "score_fp", "kept")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Lang-ID CONFUSION MATRIX: the marker-word classifier audited against
# the corpus's declared lang label — (label × predicted) counts plus
# each cell's share of its label row in exact ppm.  The eval that turns
# "we have a lang-ID heuristic" into "here is where it is wrong":
# off-diagonal hot cells localize marker lists that need work before
# the classifier gates a data mix.
# Scale: one classify pass (JVM-side token filters) + one groupBy over
# the (|langs|+1)² cell domain; label totals join classes-sized rows.
# ---------------------------------------------------------------------------

_LANGCM_ORACLE = f"""
WITH p AS (
  SELECT lang AS label, {T.sql_lang_id('text')} AS predicted_lang
  FROM documents
), cells AS (
  SELECT label, predicted_lang, cast(count(*) AS BIGINT) AS n_docs
  FROM p GROUP BY 1, 2
), totals AS (
  SELECT label, cast(sum(n_docs) AS BIGINT) AS label_total FROM cells GROUP BY 1
)
SELECT c.label, c.predicted_lang, c.n_docs,
       c.n_docs * 1000000 // t.label_total AS share_of_label_ppm
FROM cells c JOIN totals t ON t.label = c.label
ORDER BY 1, 2
"""


@register(
    "docs_lang_id_confusion_matrix",
    _LANGCM_ORACLE,
    tags=("llm", "text", "audit"),
)
def docs_lang_id_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.materialize import materialize

    docs = spread(load(spark, sf_dir, "documents"))
    # Pin the cells-sized matrix: label totals and the join both read
    # it — unpinned, the classify pass runs twice over the corpus.
    cells = materialize(
        docs.select(F.col("lang").alias("label"), T.lang_id(F.col("text")).alias("predicted_lang"))
        .groupBy("label", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
        name="langid-confusion-cells",
    )
    totals = cells.groupBy("label").agg(F.sum("n_docs").cast("long").alias("label_total"))
    return (
        cells.join(F.broadcast(totals), "label")
        .select(
            "label",
            "predicted_lang",
            "n_docs",
            ((F.col("n_docs") * 1_000_000) / F.col("label_total"))
            .cast("long")
            .alias("share_of_label_ppm"),
        )
        .orderBy("label", "predicted_lang")
    )


# ---------------------------------------------------------------------------
# WINNOWING fingerprints (the MOSS algorithm): within every window of
# W consecutive POSITIONAL k-gram hashes, select the minimum — any two
# documents sharing a substring of ≥ W+k−1 tokens are guaranteed to
# share a fingerprint, at ~2/(W+1) the density of full shingling.  The
# pair stage is an inverted-index equi-join on the selected
# fingerprints, with stop-fingerprints (document frequency > 50 —
# boilerplate phrases every doc carries) dropped before the join so
# bucket sizes stay df-bounded, never corpus-bounded.  Unlike the
# MinHash candidates (probabilistic), shared-winnow counts are exact
# and deterministic — the plagiarism-detection standard.
# Scale: positions explode ~tokens rows once; the window min is one
# keyed sort per doc; the join carries (doc, fp) pairs at winnow
# density.  Docs shorter than W+k−1 tokens have no full window and
# drop out (standard winnowing).
# ---------------------------------------------------------------------------

_WINNOW_W = 4  # window size in k-grams (k = 3 tokens)
_WINNOW_MAX_DF = 50
_WINNOW_MIN_SHARED = 2


def _winnow_oracle() -> str:
    from event_streaming_spark.functions.hashing import (
        sql_normalize_text,
        sql_stable_hash32,
    )

    toks = f"string_split({sql_normalize_text('text')}, ' ')"
    # POSITIONAL k-gram hashes: same construction as sql_shingle_hashes
    # but WITHOUT list_distinct — winnowing needs the sequence.
    gram = "array_to_string((" + toks + ")[i:i+2], ' ')"
    hs = (
        f"list_transform(generate_series(1, greatest(len({toks}) - 2, 0)),"
        f" i -> {sql_stable_hash32(gram)})"
    )
    return f"""
WITH hs AS (
  SELECT doc_id, {hs} AS hs FROM documents
), pos AS (
  SELECT doc_id, unnest(hs) AS h, generate_subscripts(hs, 1) AS ord,
         len(hs) AS n
  FROM hs
), sel AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id,
           min(h) OVER (PARTITION BY doc_id ORDER BY ord
                        ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
             AS fp,
           ord, n
    FROM pos) WHERE ord <= n - {_WINNOW_W - 1}
), df AS (
  SELECT fp FROM sel GROUP BY fp HAVING count(*) <= {_WINNOW_MAX_DF}
), kept AS (
  SELECT sel.doc_id, sel.fp FROM sel JOIN df ON df.fp = sel.fp
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(count(*) AS BIGINT) AS n_shared_fps
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {_WINNOW_MIN_SHARED}
ORDER BY 1, 2
"""


@register(
    "docs_winnowing_fingerprint_pairs",
    _winnow_oracle(),
    tags=("llm", "dedup", "fingerprint", "join"),
)
def docs_winnowing_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from event_streaming_spark.functions.hashing import normalize_text, stable_hash32

    docs = spread(load(spark, sf_dir, "documents"))
    toks = F.split(normalize_text(F.col("text")), " ")
    # positional 3-token shingle hashes (ordered, not deduped)
    hs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: stable_hash32(F.array_join(F.slice(toks, i, 3), " ")),
    )
    pos = docs.select(
        "doc_id", F.posexplode(hs).alias("ord", "h")
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("ord")
        .rowsBetween(Window.currentRow, _WINNOW_W - 1)
    )
    from event_streaming_spark.operators.materialize import materialize

    # Pin the winnowed (doc, fp) set: the df filter and BOTH self-join
    # sides read it — unpinned, the dumped plan re-ran the whole winnow
    # pass (explode + two sorts + two windows over every gram) once per
    # consumer.
    sel = materialize(
        pos.select("doc_id", F.min("h").over(w).alias("fp"), "ord", "n")
        # posexplode is 0-based (DuckDB ordinality is 1-based): same
        # "full windows only" cut, ord ≤ n − W expressed 0-based
        .filter(F.col("ord") <= F.col("n") - _WINNOW_W)
        .select("doc_id", "fp")
        .distinct(),
        name="winnow-fingerprints",
    )
    df_ok = sel.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= _WINNOW_MAX_DF
    )
    kept = sel.join(F.broadcast(df_ok.select("fp")), "fp")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= _WINNOW_MIN_SHARED)
        .orderBy("doc_a", "doc_b")
    )

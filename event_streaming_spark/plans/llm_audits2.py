"""Round-9 tranche 2: reference-LM quality scoring, LSH tuning, and
training-feature/table queries.

* ``text_lm_perplexity_vs_reference`` — the CCNet recipe (Wenzek et
  al., "CCNet: Extracting High Quality Monolingual Datasets", 2020):
  train a language model on a trusted reference slice, score every
  source by perplexity; high-perplexity sources are junk candidates.
  Here the LM is an add-1-smoothed bigram model trained on the
  ``src0`` slice; per-source cross-entropy and perplexity come from
  exact pair-type counts with the single ln() per PAIR TYPE rounded to
  DECIMAL(18,6) before the (exact, order-independent) weighted sum.
* ``docs_minhash_band_tuning_curve`` — the LSH S-curve in table form:
  the SAME 16-permutation signatures banded three ways (16×1, 8×2,
  4×4), reporting candidate volume and the share of candidates whose
  estimated Jaccard clears 0.5.  The tuning readout that decides the
  band/row trade (recall vs candidate cost) BEFORE a 100 TB dedup run;
  one signature build, three cheap band self-joins.
* ``events_user_churn_features`` — the per-user feature table a churn
  model trains on: tenure, recency, frequency, monetary (exact µ),
  active days, events-per-active-day.  One user-keyed aggregate.
* ``events_power_law_fit_user_activity`` — the continuous-MLE
  power-law exponent (Clauset-Shalizi-Newman 2009, eq. 3.1:
  α = 1 + n / Σ ln(x_i / (x_min − ½))) over per-user event counts —
  the heavy-tail check behind every skew-handling decision in this
  repo.  ln per DISTINCT count value (rounded DECIMAL) × multiplicity
  keeps the sum exact.

Scale shapes: the LM and the tuning curve are wordcount/band-join
shaped (the corpus-sized stage is tokenize/sign once); churn features
and the power-law fit are one user-keyed aggregate each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import sql_normalize_text, tokens
from event_streaming_spark.operators import similarity as S
from event_streaming_spark.operators.materialize import materialize
from event_streaming_spark.plans.catalog import load, register, spread

# ---------------------------------------------------------------------------
# Reference-LM perplexity (CCNet-style)
# ---------------------------------------------------------------------------

_LM_REF_SOURCE = "src0"

_LM_PAIRS_SQL = f"""
  SELECT source,
         unnest(ws[1:len(ws)-1]) AS w1,
         unnest(ws[2:len(ws)]) AS w2
  FROM (
    SELECT source, string_split({sql_normalize_text('text')}, ' ') AS ws
    FROM documents
  )
"""

_LM_ORACLE = f"""
WITH pairs AS MATERIALIZED ({_LM_PAIRS_SQL}),
ptype AS (
  SELECT source, w1, w2, cast(count(*) AS BIGINT) AS m
  FROM pairs GROUP BY source, w1, w2
),
refp AS (
  SELECT w1, w2, cast(count(*) AS BIGINT) AS cb
  FROM pairs WHERE source = '{_LM_REF_SOURCE}' GROUP BY w1, w2
),
refu AS (
  SELECT w1, cast(count(*) AS BIGINT) AS cu
  FROM pairs WHERE source = '{_LM_REF_SOURCE}' GROUP BY w1
),
vocab AS (
  SELECT cast(count(DISTINCT w1) AS BIGINT) AS v
  FROM (SELECT w1 FROM pairs WHERE source = '{_LM_REF_SOURCE}'
        UNION SELECT w2 FROM pairs WHERE source = '{_LM_REF_SOURCE}')
),
scored AS (
  SELECT p.source, p.m,
         cast(round(ln((coalesce(r.cb, 0) + 1.0)
                       / (coalesce(u.cu, 0) + vocab.v)), 6)
              AS DECIMAL(18,6)) AS lp
  FROM ptype p
  LEFT JOIN refp r ON r.w1 = p.w1 AND r.w2 = p.w2
  LEFT JOIN refu u ON u.w1 = p.w1
  CROSS JOIN vocab
)
SELECT source,
       cast(sum(m) AS BIGINT) AS n_pairs,
       round(-cast(sum(lp * m) AS DOUBLE) / cast(sum(m) AS DOUBLE), 6)
         AS cross_entropy,
       round(exp(round(-cast(sum(lp * m) AS DOUBLE)
                       / cast(sum(m) AS DOUBLE), 6)), 6) AS perplexity
FROM scored
GROUP BY source ORDER BY source
"""


@register(
    "text_lm_perplexity_vs_reference",
    _LM_ORACLE,
    tags=("llm", "text", "quality"),
)
def text_lm_perplexity_vs_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram add-1 LM trained on the src0 slice; per-source perplexity.
    One tokenize pass feeds pair-TYPE counts (vocabulary², not corpus,
    sized), the model join runs on pair types, and each ln() rounds to
    DECIMAL(18,6) before the exact weighted sum — order-independent.
    Scale: wordcount-shaped shuffles; the model tables are vocab-bounded
    and broadcastable."""
    docs = spread(load(spark, sf_dir, "documents"))
    pairs = (
        docs.select("source", tokens(F.col("text")).alias("s"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(s) < 2 THEN cast(array() as array<struct<w1:string,w2:string>>) "
                    "ELSE transform(sequence(1, size(s) - 1), "
                    "i -> struct(s[i-1] AS w1, s[i] AS w2)) END"
                )
            ).alias("p"),
        )
        .select("source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # one tokenize pass feeds FOUR consumers (ptype, refp, refu, vocab)
    pairs = materialize(pairs, "lm-pairs")

    ptype = pairs.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    ref = pairs.where(F.col("source") == _LM_REF_SOURCE)
    refp = ref.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    refu = ref.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("cu"))
    vocab = (
        ref.select(F.col("w1").alias("t"))
        .union(ref.select(F.col("w2").alias("t")))
        .agg(F.countDistinct("t").cast("long").alias("v"))
    )
    scored = (
        ptype.join(refp, ["w1", "w2"], "left")
        .join(refu, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "source",
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
    h = F.round(
        -F.sum(F.col("lp") * F.col("m")).cast("double")
        / F.sum("m").cast("double"),
        6,
    )
    return (
        scored.groupBy("source")
        .agg(
            F.sum("m").cast("long").alias("n_pairs"),
            h.alias("cross_entropy"),
        )
        .select(
            "source",
            "n_pairs",
            "cross_entropy",
            F.round(F.exp(F.col("cross_entropy")), 6).alias("perplexity"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# LSH band tuning curve
# ---------------------------------------------------------------------------

_BT_CONFIGS = ((16, 1), (8, 2), (4, 4))  # (bands, rows) with b·r = 16
_BT_EST_GE = 8  # matching permutations for est_jaccard >= 0.5

_BT_EQ_SUM = " + ".join(
    f"CASE WHEN sa.mh{i:02d} = sb.mh{i:02d} THEN 1 ELSE 0 END"
    for i in range(S.MINHASH_K)
)


def _bt_band_sql(b: int, r: int) -> str:
    exprs = []
    for j in range(b):
        members = " || ',' || ".join(
            f"cast(mh{i:02d} as varchar)" for i in range(j * r, (j + 1) * r)
        )
        exprs.append(f"SELECT doc_id, {j} AS band_idx, md5({members}) AS bh FROM sig")
    return " UNION ALL ".join(exprs)


def _bt_oracle() -> str:
    blocks = []
    for b, r in _BT_CONFIGS:
        blocks.append(
            f"""(
  WITH bands AS ({_bt_band_sql(b, r)}),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b
    FROM bands a JOIN bands bb
      ON a.band_idx = bb.band_idx AND a.bh = bb.bh AND a.doc_id < bb.doc_id
  ), est AS (
    SELECT ({_BT_EQ_SUM}) AS eq
    FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
  )
  SELECT {b} AS bands, {r} AS rows_per_band,
         cast(count(*) AS BIGINT) AS n_candidates,
         cast(sum(CASE WHEN eq >= {_BT_EST_GE} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_est_ge_50,
         CASE WHEN count(*) > 0
              THEN cast(sum(CASE WHEN eq >= {_BT_EST_GE} THEN 1 ELSE 0 END)
                        * 1000000 // count(*) AS BIGINT) END AS precision_ppm
  FROM est
)"""
        )
    body = " UNION ALL ".join(blocks)
    return f"""
WITH hs AS MATERIALIZED (
  SELECT doc_id, {S.sql_shingle_hashes('text')} AS hs FROM documents
), sig AS MATERIALIZED (
  SELECT doc_id, {', '.join(S.sql_minhash_exprs('hs'))} FROM hs
)
SELECT * FROM ({body}) ORDER BY bands DESC
"""


@register(
    "docs_minhash_band_tuning_curve",
    _bt_oracle(),
    tags=("llm", "dedup", "lsh", "audit"),
    # bench-tagged (VERDICT r9 #8): 34.2 s/10x makes this the heaviest
    # catalog entry not previously in bench.py.
    bench=True,
)
def docs_minhash_band_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One signature build, three band layouts, one S-curve table.
    Scale: each config's candidate generation is a (band, hash)
    equi-join exactly like the production LSH path — the curve costs
    three candidate passes over the SAME persisted signatures, never a
    re-shingle."""
    docs = spread(load(spark, sf_dir, "documents"))
    hs = docs.select("doc_id", S.shingle_hashes(F.col("text")).alias("hs"))
    sig = materialize(
        hs.select("doc_id", F.array(*S.minhash_cols(F.col("hs"))).alias("sig")),
        "bt-signatures",
    )
    out = None
    for b, r in _BT_CONFIGS:
        band_cols = []
        for j in range(b):
            parts: list = []
            for i in range(j * r, (j + 1) * r):
                if parts:
                    parts.append(F.lit(","))
                parts.append(F.col("sig")[i].cast("string"))
            band_cols.append(F.md5(F.concat(*parts)))
        bands = sig.select(
            "doc_id", "sig", F.posexplode(F.array(*band_cols)).alias("band_idx", "bh")
        )
        a, bb = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                bb,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.sig").alias("sig_a"),
                F.col("b.sig").alias("sig_b"),
            )
            .dropDuplicates(["doc_a", "doc_b"])
        )
        eq = F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda t: t,
            )
        )
        row = cand.select(eq.alias("eq")).agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("eq") >= _BT_EST_GE, 1).otherwise(0))
            .cast("long")
            .alias("n_est_ge_50"),
        ).select(
            F.lit(b).alias("bands"),
            F.lit(r).alias("rows_per_band"),
            "n_candidates",
            "n_est_ge_50",
            F.when(
                F.col("n_candidates") > 0,
                (F.col("n_est_ge_50") * 1_000_000 / F.col("n_candidates")).cast(
                    "long"
                ),
            ).alias("precision_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy(F.desc("bands"))


# ---------------------------------------------------------------------------
# Churn-model feature table
# ---------------------------------------------------------------------------

_CHURN_ORACLE = """
WITH g AS (
  SELECT max(CAST(ts AS DATE)) AS gmax FROM events
),
per_user AS (
  SELECT user_id,
         min(CAST(ts AS DATE)) AS first_day,
         max(CAST(ts AS DATE)) AS last_day,
         cast(count(*) AS BIGINT) AS n_events,
         cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases,
         cast(sum(CASE WHEN event_type = 'purchase'
                       THEN cast(round(value * 1000000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS monetary_micro,
         cast(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
  FROM events GROUP BY user_id
)
SELECT user_id,
       cast(last_day - first_day AS BIGINT) AS tenure_days,
       cast(g.gmax - last_day AS BIGINT) AS recency_days,
       n_events, n_purchases, monetary_micro, active_days,
       cast(n_events * 1000000 // active_days AS BIGINT)
         AS events_per_active_day_ppm
FROM per_user CROSS JOIN g
ORDER BY user_id
"""


@register(
    "events_user_churn_features",
    _CHURN_ORACLE,
    tags=("events", "features", "ml"),
)
def events_user_churn_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM-style churn features, one user-keyed aggregate (map-side
    combined); the global max day is a 1-row broadcast."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    g = ev.agg(F.max("day").alias("gmax"))
    pv = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 1_000_000).cast("long"),
    ).otherwise(F.lit(0))
    per_user = ev.groupBy("user_id").agg(
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.sum(pv).cast("long").alias("monetary_micro"),
        F.countDistinct("day").cast("long").alias("active_days"),
    )
    return (
        per_user.crossJoin(F.broadcast(g))
        .select(
            "user_id",
            F.datediff("last_day", "first_day").cast("long").alias("tenure_days"),
            F.datediff("gmax", "last_day").cast("long").alias("recency_days"),
            "n_events",
            "n_purchases",
            "monetary_micro",
            "active_days",
            # exact integer div — event-count numerators can cross 2^53 at
            # corpus scale, where double / + cast would silently round.
            F.expr("(n_events * CAST(1000000 AS BIGINT)) div active_days")
            .cast("long")
            .alias("events_per_active_day_ppm"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Power-law exponent (continuous MLE) over user activity
# ---------------------------------------------------------------------------

_PL_XMIN = 5

_PL_ORACLE = f"""
WITH act AS (
  SELECT user_id, cast(count(*) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
tailc AS (
  SELECT x, cast(count(*) AS BIGINT) AS k
  FROM act WHERE x >= {_PL_XMIN} GROUP BY x
),
terms AS (
  SELECT k,
         cast(round(ln(cast(x AS DOUBLE) / {_PL_XMIN - 0.5}), 6)
              AS DECIMAL(18,6)) AS lx
  FROM tailc
),
agg AS (
  SELECT cast(sum(k) AS BIGINT) AS n_tail,
         sum(lx * k) AS s
  FROM terms
)
SELECT {_PL_XMIN} AS x_min,
       (SELECT cast(count(*) AS BIGINT) FROM act) AS n_users,
       n_tail,
       round(1.0 + cast(n_tail AS DOUBLE) / cast(s AS DOUBLE), 6) AS alpha
FROM agg
"""


@register(
    "events_power_law_fit_user_activity",
    _PL_ORACLE,
    tags=("events", "stats", "skew"),
)
def events_power_law_fit_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α = 1 + n/Σ ln(x_i/(x_min−½)) over per-user event counts
    (Clauset-Shalizi-Newman).  ln per DISTINCT count value rounds to
    DECIMAL(18,6) before the multiplicity-weighted exact sum.  Scale:
    one user-keyed count, then a distinct-count-value (≤ max activity)
    frame."""
    ev = load(spark, sf_dir, "events")
    act = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("x"))
    n_users = act.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    tailc = (
        act.where(F.col("x") >= _PL_XMIN)
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    terms = tailc.select(
        "k",
        F.round(F.log(F.col("x").cast("double") / F.lit(_PL_XMIN - 0.5)), 6)
        .cast("decimal(18,6)")
        .alias("lx"),
    )
    agg = terms.agg(
        F.sum("k").cast("long").alias("n_tail"),
        F.sum(F.col("lx") * F.col("k")).alias("s"),
    )
    return agg.crossJoin(F.broadcast(n_users)).select(
        F.lit(_PL_XMIN).alias("x_min"),
        "n_users",
        "n_tail",
        F.round(
            1.0 + F.col("n_tail").cast("double") / F.col("s").cast("double"), 6
        ).alias("alpha"),
    )

"""Near-dup + similarity-search queries over documents/embeddings (SURVEY §2.5).

Scale design, per query, is in the docstrings — the common theme: candidate
generation is always an equi-join on a derived key (LSH band, hyperplane
bucket, source partition), never an O(n²) cross join; the only cross join
is the brute-force baseline whose small side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from event_streaming_spark.functions.numeric import cosine
from event_streaming_spark.operators import similarity as S
from event_streaming_spark.operators.joins import triangle_self_pair_join
from event_streaming_spark.operators.materialize import materialize
from event_streaming_spark.operators.ranks import topk_per_group
from event_streaming_spark.plans.catalog import capture_plan, load, register, spread

# ---------------------------------------------------------------------------
# MinHash signatures (k=16 permutations over 3-token shingles).
# Stateless projection — pipelines into the scan, no shuffle.
# ---------------------------------------------------------------------------

_SIG_ORACLE = f"""
WITH hs AS (
  SELECT doc_id, {S.sql_shingle_hashes('text')} AS hs FROM documents
)
SELECT doc_id, {', '.join(S.sql_minhash_exprs('hs'))}
FROM hs
"""


@register("minhash_signatures", _SIG_ORACLE, tags=("llm", "dedup", "hash"))
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    hs = docs.select("doc_id", S.shingle_hashes(F.col("text")).alias("hs"))
    return hs.select("doc_id", *S.minhash_cols(F.col("hs")))


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup pairs: band signatures into LSH_BANDS buckets, join
# on (band_idx, band_hash) to generate candidates, verify with the estimated
# Jaccard (fraction of equal minhashes), keep est >= 0.3.
# Scale: the band self-join shuffles on band hash — candidates only; with
# b bands of r rows the false-candidate rate is tunable, and skewed buckets
# split under AQE.  This is the canonical 100 TB near-dup plan.
# ---------------------------------------------------------------------------

_EQ_SUM = " + ".join(
    f"(CASE WHEN sa.mh{i:02d} = sb.mh{i:02d} THEN 1 ELSE 0 END)" for i in range(S.MINHASH_K)
)

_LSH_ORACLE = f"""
WITH hs AS (
  SELECT doc_id, {S.sql_shingle_hashes('text')} AS hs FROM documents
), sig AS (
  SELECT doc_id, {', '.join(S.sql_minhash_exprs('hs'))} FROM hs
), banded AS (
  SELECT doc_id, {', '.join(S.sql_band_hash_exprs())} FROM sig
), bands AS (
  {' UNION ALL '.join(f"SELECT doc_id, {j} AS band_idx, band{j} AS bh FROM banded" for j in range(S.LSH_BANDS))}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, est_jaccard FROM (
  SELECT doc_a, doc_b,
         round(cast({_EQ_SUM} as double) / {S.MINHASH_K}, 6) AS est_jaccard
  FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
) WHERE est_jaccard >= 0.3
"""


@register("minhash_lsh_near_dup_pairs", _LSH_ORACLE, tags=("llm", "dedup", "join"), bench=True)
def minhash_lsh_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    hs = docs.select("doc_id", S.shingle_hashes(F.col("text")).alias("hs"))
    sig = hs.select(
        "doc_id", F.array(*S.minhash_cols(F.col("hs"))).alias("sig")
    )
    # Materialize signatures ONCE: both sides of the band self-join (and the
    # verification step) reuse them instead of recomputing shingle+md5 3×.
    # At 100 TB this is a persisted signatures table — standard practice;
    # the `table` materializer strategy does exactly that.
    sig = materialize(sig, "minhash-signatures")
    bands = sig.select(
        "doc_id",
        "sig",
        F.posexplode(F.array(*S.band_hashes_over(F.col("sig")))).alias("band_idx", "bh"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
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
        .dropDuplicates(["doc_a", "doc_b"])  # same pair from multiple bands
    )
    return cand.select(
        "doc_a",
        "doc_b",
        S.minhash_est_jaccard_arrays(F.col("sig_a"), F.col("sig_b")).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= 0.3)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard within a blocking key (same source): the verification
# step of a dedup pipeline.  Scale: blocking key join, never all-pairs.
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, source, {S.sql_shingle_hashes('text')} AS sh FROM documents
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(cast(len(list_intersect(a.sh, b.sh)) as double)
               / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
) WHERE jaccard >= 0.12
"""


@register("ngram_jaccard_same_source_pairs", _JACCARD_ORACLE, tags=("llm", "dedup", "join"))
def ngram_jaccard_same_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Triangle-bucketed self-join: source has ~20 distinct values, so a
    # plain source-blocked self-join caps parallelism at 20 straggler
    # tasks each owning a quadratic pair space (see triangle_self_pair_join).
    docs = spread(load(spark, sf_dir, "documents"))
    sh = docs.select("doc_id", "source", S.shingle_hashes(F.col("text")).alias("sh"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_distinct(F.concat(F.col("a.sh"), F.col("b.sh"))))
    return (
        triangle_self_pair_join(sh, id_col="doc_id", block_cols=["source"], n_buckets=8)
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.12)
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k: the ANN correctness baseline.
# Scale: the query side (10 vectors) broadcasts; the corpus streams through
# ONE scan; per-query rank via window on the broadcast key.  At 100 TB the
# corpus never shuffles — only the (tiny) scored candidates do.
# ---------------------------------------------------------------------------

_COS_TOPK_ORACLE = """
SELECT qid, neighbor_id, cos_sim, rn FROM (
  SELECT qid, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM (
    SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                 (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id <> a.vec_id
  )
) WHERE rn <= 5
"""


@register("emb_cosine_topk_bruteforce", _COS_TOPK_ORACLE, tags=("llm", "ann"), bench=True)
def emb_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.numeric import dot, l2_norm

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        # query norms ride the broadcast — computed once per query
        l2_norm(F.col("embedding")).alias("q_nrm"),
    )
    # corpus-side norms compute ONCE PER VECTOR before the fanout to
    # |q| pairs: the per-pair cosine is then one zip-fold (the dot)
    # instead of three — HOF folds never enter whole-stage codegen, so
    # fold count IS the cost model on a corpus x queries scan (the r10
    # hubness lesson).  l2_norm is the same fold as inside cosine(), so
    # every double (and the oracle hash) is unchanged.
    e = emb.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("e_nrm")
    )
    pairs = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            dot(F.col("qv"), F.col("embedding"))
            / (F.col("q_nrm") * F.col("e_nrm")),
            6,
        ).alias("cos_sim"),
    )
    # two-stage top-k: a bare per-qid window would push every qid's FULL
    # corpus of scored candidates through one task (operators/ranks.py).
    return topk_per_group(
        pairs, "qid", [F.desc("cos_sim"), F.asc("neighbor_id")], 5, rn_col="rn"
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN: bucket every vector by the sign pattern of
# HYPERPLANES projections; search only within the query's bucket.
# Scale: candidate generation = equi-join on bucket id (shuffle on a
# 2^HYPERPLANES-ary key), corpus scanned once; the recall/speed trade comes
# from the plane count — the classic SimHash ANN layout.
# ---------------------------------------------------------------------------

_B = S.sql_hyperplane_bucket("embedding")
_LSH_ANN_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding, {_B} AS bucket FROM embeddings
)
SELECT qid, neighbor_id, bucket, cos_sim, rn FROM (
  SELECT qid, neighbor_id, bucket, cos_sim,
         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM (
    SELECT q.vec_id AS qid, c.vec_id AS neighbor_id, q.bucket AS bucket,
           round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
                 (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS cos_sim
    FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
    WHERE q.vec_id < 10
  )
) WHERE rn <= 3
"""


@register("emb_lsh_ann_topk", _LSH_ANN_ORACLE, tags=("llm", "ann", "lsh"))
def emb_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    b = emb.withColumn("bucket", S.hyperplane_bucket(F.col("embedding")))
    q = b.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), F.col("bucket").alias("qb")
    )
    cand = b.join(
        F.broadcast(q), (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("qid"))
    ).select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        F.col("qb").alias("bucket"),
        F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cos_sim"),
    )
    # two-stage top-k (operators/ranks.py): per-qid candidates are
    # bucket-bounded but still corpus/2^planes rows — never one task.
    return topk_per_group(
        cand, "qid", [F.desc("cos_sim"), F.asc("neighbor_id")], 3, rn_col="rn"
    )


# ---------------------------------------------------------------------------
# Per-label centroids (IVF coarse-quantizer building block): exact decimal
# mean per (label, dim) — long format, one shuffle on (label, dim).
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
SELECT label, d AS dim,
       round(cast(sum(cast(embedding[d + 1] as decimal(30,10))) as double) / count(*), 6)
         AS centroid_val
FROM embeddings, range(64) t(d)
GROUP BY label, d
"""


@register("emb_centroid_per_label", _CENTROID_ORACLE, tags=("llm", "ann", "agg"))
def emb_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select("label", F.posexplode("embedding").alias("dim", "x"))
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(30,10)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("centroid_val")
        )
    )


# ---------------------------------------------------------------------------
# IVF two-stage ANN (SURVEY §2.5 "IVF or LSH-bucketed variant"): coarse
# quantization by label-cell centroids (exact decimal means), probe the
# nprobe=3 nearest cells per query, exact cosine only within those cells.
# Scale: stage 1 touches n_cells centroids (broadcast); stage 2 scans only
# nprobe/n_cells of the corpus — the classic IVF trade.  Entirely
# relational: two broadcast joins + one window, no UDFs.
# ---------------------------------------------------------------------------

_IVF_ORACLE = """
WITH cent AS (
  SELECT label, list(c ORDER BY dim) AS centroid FROM (
    SELECT label, d AS dim,
           cast(round(cast(sum(cast(embedding[d + 1] as decimal(30,10))) as double)
                      / count(*), 6) as double) AS c
    FROM embeddings, range(64) t(d)
    GROUP BY label, d
  ) GROUP BY label
), q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
), probe AS (
  SELECT qid, label FROM (
    SELECT q.qid, cent.label,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round(list_dot_product(q.qv::DOUBLE[], cent.centroid) /
                   (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) *
                    sqrt(list_dot_product(cent.centroid, cent.centroid))), 6) DESC,
               cent.label) AS cell_rank
    FROM q, cent
  ) WHERE cell_rank <= 3
)
SELECT qid, neighbor_id, cos_sim, rn FROM (
  SELECT qid, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM (
    SELECT q.qid, e.vec_id AS neighbor_id,
           round(list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[]) /
                 (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) *
                  sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS cos_sim
    FROM probe JOIN q USING (qid)
               JOIN embeddings e ON e.label = probe.label AND e.vec_id <> q.qid
  )
) WHERE rn <= 5
"""


def _ivf_centroids(emb: DataFrame) -> DataFrame:
    """Exact per-cell centroids (order-independent decimal means),
    reassembled into arrays — (label, centroid), K rows, broadcastable.
    Shared by the inline two-stage query and the persisted-index BUILD
    (one definition keeps the decimal/round-6 oracle parity in one
    place)."""
    exploded = emb.select("label", F.posexplode("embedding").alias("dim", "x"))
    cent_long = exploded.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(30,10)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("c")
    )
    return cent_long.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s.c
        ).alias("centroid")
    )


@register("emb_ivf_two_stage_ann", _IVF_ORACLE, tags=("llm", "ann", "ivf"), bench=True)
def emb_ivf_two_stage_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # stage 0: centroid table — tiny → broadcast
    cent = _ivf_centroids(emb)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    # stage 1: rank cells per query, keep nprobe=3
    scored_cells = q.crossJoin(F.broadcast(cent)).select(
        "qid", "label", F.round(cosine(F.col("qv"), F.col("centroid")), 6).alias("csim")
    )
    wcell = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("label"))
    probe = (
        scored_cells.withColumn("cell_rank", F.row_number().over(wcell))
        .filter(F.col("cell_rank") <= 3)
        .select("qid", "label")
    )
    # stage 2: exact cosine only within probed cells
    p = probe.join(F.broadcast(q), "qid").alias("p")
    e = emb.alias("e")
    cand = (
        p.join(e, (F.col("e.label") == F.col("p.label")) & (F.col("e.vec_id") != F.col("p.qid")))
        .select(
            F.col("p.qid").alias("qid"),
            F.col("e.vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("p.qv"), F.col("e.embedding")), 6).alias("cos_sim"),
        )
    )
    # two-stage top-k (operators/ranks.py): probed-cell candidates scale
    # with cell population — never one task per qid.  (The wcell window
    # above is fine: it ranks K centroids per query, K is config-bounded.)
    return topk_per_group(
        cand, "qid", [F.desc("cos_sim"), F.asc("neighbor_id")], 5, rn_col="rn"
    )


# ---------------------------------------------------------------------------
# ANN self-audit: recall of the hyperplane-LSH top-3 against the exact
# brute-force top-3, per query vector.  The engine measures its own
# approximation quality — the number you watch when tuning plane count /
# nprobe at scale.  Composes the two queries above by reference (one
# definition each, reused on both engines).
# ---------------------------------------------------------------------------

_RECALL_ORACLE = f"""
WITH bf AS (
  SELECT qid, neighbor_id FROM ({_COS_TOPK_ORACLE}) WHERE rn <= 3
), ann AS (
  SELECT qid, neighbor_id FROM ({_LSH_ANN_ORACLE})
)
SELECT bf.qid AS qid,
       count(ann.neighbor_id) AS n_hit,
       round(count(ann.neighbor_id) / 3.0, 6) AS recall_at_3
FROM bf LEFT JOIN ann ON bf.qid = ann.qid AND bf.neighbor_id = ann.neighbor_id
GROUP BY bf.qid
"""


@register("emb_lsh_recall_audit", _RECALL_ORACLE, tags=("llm", "ann", "audit"), bench=True)
def emb_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = emb_cosine_topk_bruteforce(spark, sf_dir).filter(F.col("rn") <= 3).select(
        "qid", "neighbor_id"
    )
    ann = emb_lsh_ann_topk(spark, sf_dir).select(
        F.col("qid").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    return (
        bf.join(
            ann,
            (bf.qid == F.col("a_qid")) & (bf.neighbor_id == F.col("a_nid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("a_nid").alias("n_hit"),
            F.round(F.count("a_nid") / 3.0, 6).alias("recall_at_3"),
        )
    )


# ---------------------------------------------------------------------------
# Edit-distance near-dup pairs: exact Levenshtein over a fixed prefix,
# within-source, length-band prefiltered.  Complements the token-level
# dedup family (minhash/simhash/jaccard see shared vocabulary; edit
# distance sees character-level templating — boilerplate with small
# substitutions).  Scale: same triangle-bucketed pair shape as the
# jaccard query; the length-band residual prunes before the O(len²)
# distance, and the fixed 80-char prefix caps per-pair cost — prefix
# width and band are the knobs.  The DP itself is JVM-side (built-in
# ``levenshtein``), never a Python UDF.
# ---------------------------------------------------------------------------

_EDIT_DIST_ORACLE = """
WITH d AS (
  SELECT doc_id, source, n_chars, substr(text, 1, 80) AS p
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.p, b.p) AS prefix_edit_dist
FROM d a JOIN d b
  ON a.source = b.source AND a.doc_id < b.doc_id
 AND abs(a.n_chars - b.n_chars) <= 400
WHERE levenshtein(a.p, b.p) <= 50
"""


@register("docs_edit_distance_pairs", _EDIT_DIST_ORACLE, tags=("llm", "dedup", "text"))
def docs_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", F.substring("text", 1, 80).alias("p")
    )
    pairs = triangle_self_pair_join(d, id_col="doc_id", block_cols=["source"], n_buckets=8)
    return (
        pairs.filter(
            F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 400
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            # 3-arg thresholded form: banded DP that aborts once a row's
            # minimum exceeds 50 (returns -1 above threshold, the exact
            # distance otherwise — equivalent to the oracle's full-DP
            # `levenshtein(...) <= 50` filter, cheaper on far pairs).
            F.expr("levenshtein(a.p, b.p, 50)").alias("prefix_edit_dist"),
        )
        .filter(F.col("prefix_edit_dist") >= 0)
    )


# ---------------------------------------------------------------------------
# Scale-safe edit-distance near-dup: the PRODUCTION composition.  The exact
# query above is a bounded-scope audit (all pairs within a source block —
# 17.4× wall at 10×, by contract); this one generates candidates with the
# MinHash-LSH band join (candidate volume tracks true near-dup density, not
# corpus²) and only then verifies with the thresholded Levenshtein DP.
# Scale: signatures computed once and materialized; the band self-join is
# the only pair generator (equi-join on (band_idx, band_hash) — shuffle on
# the band key); the per-pair DP runs on candidates only, JVM-side via the
# 3-arg early-abort `levenshtein`.  At 100 TB this is the same plan with
# the signature table persisted — the `table` materializer strategy.
# ---------------------------------------------------------------------------

_EDIT_LSH_ORACLE = f"""
WITH hs AS (
  SELECT doc_id, {S.sql_shingle_hashes('text')} AS hs FROM documents
), sig AS (
  SELECT doc_id, {', '.join(S.sql_minhash_exprs('hs'))} FROM hs
), banded AS (
  SELECT doc_id, {', '.join(S.sql_band_hash_exprs())} FROM sig
), bands AS (
  {' UNION ALL '.join(f"SELECT doc_id, {j} AS band_idx, band{j} AS bh FROM banded" for j in range(S.LSH_BANDS))}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id
), d AS (
  SELECT doc_id, substr(text, 1, 80) AS p FROM documents
)
SELECT doc_a, doc_b, levenshtein(da.p, db.p) AS prefix_edit_dist
FROM cand JOIN d da ON da.doc_id = doc_a JOIN d db ON db.doc_id = doc_b
WHERE levenshtein(da.p, db.p) <= 50
"""


@register("docs_edit_distance_near_dup", _EDIT_LSH_ORACLE, tags=("llm", "dedup", "text", "join"))
def docs_edit_distance_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    hs = docs.select("doc_id", S.shingle_hashes(F.col("text")).alias("hs"))
    sig = hs.select("doc_id", F.array(*S.minhash_cols(F.col("hs"))).alias("sig"))
    sig = materialize(sig, "editdist-lsh-signatures")
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*S.band_hashes_over(F.col("sig")))).alias("band_idx", "bh"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    d = docs.select("doc_id", F.substring("text", 1, 80).alias("p"))
    return (
        cand.join(d.select(F.col("doc_id").alias("doc_a"), F.col("p").alias("pa")), "doc_a")
        .join(d.select(F.col("doc_id").alias("doc_b"), F.col("p").alias("pb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("levenshtein(pa, pb, 50)").alias("prefix_edit_dist"),
        )
        .filter(F.col("prefix_edit_dist") >= 0)
    )


# ---------------------------------------------------------------------------
# Incremental dedup: match an incoming INCREMENT of documents against the
# existing corpus INDEX without touching index×index pairs — the shape
# every production ingest runs (per-batch dedup against a persisted
# signature table; recomputing all pairs per ingest is O(corpus²) and
# impossible at 100 TB).  The increment here is carved out by a hash
# gate (~10% of docs) so the query is self-contained and oracle-exact;
# in production the increment is the new batch and the index signatures
# are the materialized table the `table` materializer strategy writes.
# Scale: signatures computed once per side, banded equi-join is
# increment-bands × index-bands only — candidate volume scales with the
# INCREMENT, not the corpus, and a small increment's band table
# broadcasts under AQE.
# ---------------------------------------------------------------------------

from event_streaming_spark.functions.hashing import sql_stable_hash32 as _sql_h32  # noqa: E402

_INCR_ORACLE = f"""
WITH hs AS (
  SELECT doc_id, {S.sql_shingle_hashes('text')} AS hs,
         {_sql_h32("'incr|' || cast(doc_id AS VARCHAR)")} % 10 AS g
  FROM documents
), sig AS (
  SELECT doc_id, g, {', '.join(S.sql_minhash_exprs('hs'))} FROM hs
), banded AS (
  SELECT doc_id, g, {', '.join(S.sql_band_hash_exprs())} FROM sig
), bands AS (
  {' UNION ALL '.join(f"SELECT doc_id, g, {j} AS band_idx, band{j} AS bh FROM banded" for j in range(S.LSH_BANDS))}
), cand AS (
  SELECT DISTINCT n.doc_id AS new_doc, x.doc_id AS index_doc
  FROM bands n JOIN bands x ON n.band_idx = x.band_idx AND n.bh = x.bh
  WHERE n.g = 7 AND x.g <> 7
), scored AS (
  SELECT new_doc, index_doc,
         round(cast({_EQ_SUM} as double) / {S.MINHASH_K}, 6) AS est_jaccard
  FROM cand JOIN sig sa ON sa.doc_id = new_doc JOIN sig sb ON sb.doc_id = index_doc
)
SELECT new_doc, count(*) AS n_index_matches,
       max(est_jaccard) AS best_est, min(index_doc) AS first_match
FROM scored WHERE est_jaccard >= 0.3
GROUP BY new_doc
"""


@register("dedup_incremental_vs_index", _INCR_ORACLE, tags=("llm", "dedup", "join"))
def dedup_incremental_vs_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.hashing import stable_hash32

    docs = spread(load(spark, sf_dir, "documents"))
    hs = docs.select(
        "doc_id",
        S.shingle_hashes(F.col("text")).alias("hs"),
        (stable_hash32(F.concat(F.lit("incr|"), F.col("doc_id").cast("string"))) % 10).alias("g"),
    )
    sig = materialize(
        hs.select("doc_id", "g", F.array(*S.minhash_cols(F.col("hs"))).alias("sig")),
        "incr-signatures",
    )
    bands = sig.select(
        "doc_id", "g", "sig",
        F.posexplode(F.array(*S.band_hashes_over(F.col("sig")))).alias("band_idx", "bh"),
    )
    incr = bands.filter(F.col("g") == 7).alias("n")
    index = bands.filter(F.col("g") != 7).alias("x")
    cand = (
        incr.join(
            index,
            (F.col("n.band_idx") == F.col("x.band_idx")) & (F.col("n.bh") == F.col("x.bh")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc"),
            F.col("x.doc_id").alias("index_doc"),
            F.col("n.sig").alias("sig_a"),
            F.col("x.sig").alias("sig_b"),
        )
        .dropDuplicates(["new_doc", "index_doc"])
    )
    scored = cand.select(
        "new_doc",
        "index_doc",
        S.minhash_est_jaccard_arrays(F.col("sig_a"), F.col("sig_b")).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= 0.3)
    return scored.groupBy("new_doc").agg(
        F.count(F.lit(1)).alias("n_index_matches"),
        F.max("est_jaccard").alias("best_est"),
        F.min("index_doc").alias("first_match"),
    )


# ---------------------------------------------------------------------------
# Matryoshka (truncated-dimension) retrieval audit: rank by cosine over
# only the FIRST 32 of 64 dimensions and measure recall@3 against the
# full-dimension exact top-3 — the adaptive-retrieval question MRL-style
# embeddings pose ("how much ranking quality do the cheap prefix dims
# keep?").  Same plan shape as the brute-force baseline: query side
# broadcasts, corpus streams once, two-stage top-k; the only change is
# the slice, which HALVES the per-candidate dot-product cost — exactly
# the economics truncated retrieval buys at 100 TB.
#
# Determinism: both engines compute the same IEEE chain (sequential
# fold dot products on identical doubles, one sqrt/div/round), the same
# contract every cosine query here relies on.
# ---------------------------------------------------------------------------

_MAT_DIMS = 32

_MATRYOSHKA_ORACLE = f"""
WITH fullk AS (
  SELECT qid, neighbor_id FROM (
    SELECT qid, neighbor_id,
           row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM (
      SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
             round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id <> a.vec_id
    )
  ) WHERE rn <= 3
), pre AS (
  SELECT vec_id, embedding[1:{_MAT_DIMS}]::DOUBLE[] AS p FROM embeddings
), prek AS (
  SELECT qid, neighbor_id FROM (
    SELECT qid, neighbor_id,
           row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM (
      SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
             round(list_dot_product(a.p, b.p) /
                   (sqrt(list_dot_product(a.p, a.p)) *
                    sqrt(list_dot_product(b.p, b.p))), 6) AS cos_sim
      FROM pre a JOIN pre b ON a.vec_id < 10 AND b.vec_id <> a.vec_id
    )
  ) WHERE rn <= 3
)
SELECT f.qid,
       count(p.neighbor_id) AS n_hit,
       round(count(p.neighbor_id) / 3.0, 6) AS recall_at_3
FROM fullk f
LEFT JOIN prek p ON p.qid = f.qid AND p.neighbor_id = f.neighbor_id
GROUP BY f.qid
ORDER BY f.qid
"""


@register(
    "emb_matryoshka_recall",
    _MATRYOSHKA_ORACLE,
    tags=("llm", "ann", "audit"),
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@3 of 32-dim prefix-cosine ranking vs the full 64-dim
    exact top-3, per query vector."""
    emb = load(spark, sf_dir, "embeddings")
    pre = emb.select("vec_id", F.slice("embedding", 1, _MAT_DIMS).alias("p"))
    q = pre.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("p").alias("qv")
    )
    pairs = pre.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("p")), 6).alias("cos_sim"),
    )
    prek = topk_per_group(
        pairs, "qid", [F.desc("cos_sim"), F.asc("neighbor_id")], 3, rn_col="rn"
    ).select(F.col("qid").alias("p_qid"), F.col("neighbor_id").alias("p_nid"))
    fullk = emb_cosine_topk_bruteforce(spark, sf_dir).filter(F.col("rn") <= 3).select(
        "qid", "neighbor_id"
    )
    return (
        fullk.join(
            prek,
            (fullk.qid == F.col("p_qid")) & (fullk.neighbor_id == F.col("p_nid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("p_nid").alias("n_hit"),
            F.round(F.count("p_nid") / 3.0, 6).alias("recall_at_3"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009): the
# RAG-serving pattern — a lexical BM25 ranking and a dense cosine ranking
# fused by RRF(d) = Σ_legs 1/(60 + rank_leg(d)), which rewards documents
# BOTH retrievers surface without comparing incomparable score scales.
#
# Exact-integer fusion: contribution = 1_000_000 // (60 + rank) per leg
# (missing leg = 0), so fused scores are bit-identical on any engine.
# Doc↔vector linkage is vec_id = doc_id (the embedding row of the
# document); partial coverage (docs without embeddings, vectors without
# text hits) is the realistic serving case and the outer fuse handles it.
#
# Scale shape: the BM25 leg is the postings plan (work ∝ matched
# postings); the dense leg broadcasts ONE query vector and streams the
# corpus once into a TakeOrdered top-k (no global sort, no window over
# the corpus); the two rank assignments and the fuse run on k-bounded
# (≤20-row) frames — single-partition windows there are k-bounded by
# construction, not data-bounded.  At 100 TB the dense leg swaps in the
# IVF-PQ searcher (emb_ivf_pq_search) — the fusion is rank-based, so the
# plan above the legs is unchanged.
# ---------------------------------------------------------------------------

_RRF_K = 60          # the standard RRF damping constant
_RRF_SCALE = 1_000_000
_FUSE_TOP = 10

_HYBRID_RRF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, t AS term
  FROM (
    SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t
    FROM documents
  ) WHERE t <> ''
), dl AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
), g AS (
  SELECT cast(sum(dl) AS BIGINT) AS big_l, count(*) AS n_docs FROM dl
), tf AS (
  SELECT doc_id, term, least(count(*), 63) AS tf
  FROM tok WHERE term IN ('vector', 'stream', 'hash')
  GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), idf AS (
  SELECT term, ((n_docs - df + 1) * 1000) // (df + 1) AS idf_fp FROM df, g
), s AS (
  SELECT tf.doc_id,
         (idf_fp * tf * 44 * big_l)
           // (20 * tf * big_l + 6 * big_l + 18 * dl.dl * n_docs) AS s_fp
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), g
), lex0 AS (
  SELECT doc_id, cast(sum(s_fp) AS BIGINT) AS score_fp
  FROM s GROUP BY doc_id
  ORDER BY score_fp DESC, doc_id LIMIT 20
), lex AS (
  SELECT doc_id, cast(row_number() OVER (ORDER BY score_fp DESC, doc_id) AS BIGINT) AS lex_rank
  FROM lex0
), qv AS (
  SELECT embedding AS q FROM embeddings WHERE vec_id = 0
), sem0 AS (
  SELECT c.vec_id AS doc_id,
         round(list_dot_product(q.q::DOUBLE[], c.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.q::DOUBLE[], q.q::DOUBLE[])) *
                sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS cos_sim
  FROM embeddings c, qv q WHERE c.vec_id <> 0
  ORDER BY cos_sim DESC, doc_id LIMIT 20
), sem AS (
  SELECT doc_id, cast(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS sem_rank
  FROM sem0
)
SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       cast(coalesce({_RRF_SCALE} // ({_RRF_K} + lex_rank), 0)
          + coalesce({_RRF_SCALE} // ({_RRF_K} + sem_rank), 0) AS BIGINT) AS rrf_fp,
       lex_rank, sem_rank
FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id
ORDER BY rrf_fp DESC, doc_id
LIMIT {_FUSE_TOP}
"""


@register(
    "search_hybrid_rrf_fusion",
    _HYBRID_RRF_ORACLE,
    tags=("llm", "search", "ann", "topk"),
)
def search_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by exact-integer reciprocal-rank fusion of the
    BM25 postings ranking and the dense cosine ranking (query = vec 0)."""
    from event_streaming_spark.plans.scale_ops3 import docs_bm25_postings_rank

    lex0 = docs_bm25_postings_rank(spark, sf_dir)  # ≤20 rows by construction
    # k-bounded single-partition window (20 rows), NOT a corpus window
    w = Window.orderBy(F.desc("score_fp"), "doc_id")
    lex = lex0.select(
        "doc_id", F.row_number().over(w).cast("long").alias("lex_rank")
    )
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    sem0 = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("q"), F.col("embedding")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "doc_id")
        .limit(20)
    )
    ws = Window.orderBy(F.desc("cos_sim"), "doc_id")
    sem = sem0.select(
        "doc_id", F.row_number().over(ws).cast("long").alias("sem_rank")
    )
    fused = lex.join(sem, "doc_id", "full").select(
        "doc_id",
        (
            F.coalesce(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + lex_rank)"), F.lit(0))
            + F.coalesce(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + sem_rank)"), F.lit(0))
        ).cast("long").alias("rrf_fp"),
        "lex_rank",
        "sem_rank",
    )
    return fused.orderBy(F.desc("rrf_fp"), "doc_id").limit(_FUSE_TOP)


# ---------------------------------------------------------------------------
# Persisted IVF index search: build the index ONCE as a cell-partitioned
# table (operators/ivfindex.py — module doc has the 100 TB story), then
# answer the query batch by scanning ONLY the probed cells' partitions.
# Same semantics as emb_ivf_two_stage_ann (same oracle); the difference
# is the physical path: partition pruning replaces the full-corpus scan,
# which is the build/search split every production vector store makes.
# The probed-cell collect is |queries|×nprobe-bounded (30 here) — a
# config-sized driver list, the same class as the Bloom manifest.
# ---------------------------------------------------------------------------


# The single-query oracle is the batch oracle with the query-set predicate
# narrowed to one vector.  Derive it by replacement, but FAIL LOUDLY if the
# anchor string is ever reworded — a silent no-op would grade this query
# against the wrong (10-query) oracle (r6 review).
_IVF_SINGLE_ORACLE = _IVF_ORACLE.replace("WHERE vec_id < 10", "WHERE vec_id = 0")
assert _IVF_SINGLE_ORACLE != _IVF_ORACLE, (
    "anchor 'WHERE vec_id < 10' not found in _IVF_ORACLE — "
    "the single-query oracle derivation silently no-opped"
)


@register(
    "emb_ivf_persisted_index_search",
    # the SERVING case: one query vector — |probes| = nprobe < k by
    # construction, so the pruned read is honestly partial at any SF
    # (a query BATCH can union its probes to every cell; see BASELINE's
    # r6 pruning measurement for the batch-degeneracy caveat)
    _IVF_SINGLE_ORACLE,
    tags=("llm", "ann", "ivf", "store"),
)
def emb_ivf_persisted_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from event_streaming_spark.operators.ivfindex import (
        build_ivf_index,
        probe_cells,
        read_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    idx_dir = tempfile.mkdtemp(prefix="est-ivfidx-")
    try:
        # BUILD: cell = coarse quantizer output (the per-label mean is the
        # exact centroid of cell=label, so label IS the assignment here —
        # the same quantizer emb_ivf_two_stage_ann uses inline).  The
        # K-row centroid table persists WITH the index: search reads it
        # back instead of re-deriving it with a full corpus scan (which
        # would defeat the build/search split).
        build_ivf_index(
            emb.withColumn("cell", F.col("label")), idx_dir, centroids=_ivf_centroids(emb)
        )

        # SEARCH from here on: only the persisted index is touched —
        # the K-row centroid table plus the probed cells' partitions.
        cent = read_centroids(idx_dir, spark)
        q = emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        scored_cells = q.crossJoin(F.broadcast(cent)).select(
            "qid",
            "label",
            F.round(cosine(F.col("qv"), F.col("centroid")), 6).alias("csim"),
        )
        wcell = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("label"))
        probe = (
            scored_cells.withColumn("cell_rank", F.row_number().over(wcell))
            .filter(F.col("cell_rank") <= 3)
            .select("qid", F.col("label").alias("cell"))
        )
        # |queries|×nprobe-bounded collect → literal IN → partition pruning
        cells = sorted({r["cell"] for r in probe.select("cell").distinct().collect()})
        pruned = probe_cells(idx_dir, spark, cells)

        p = probe.join(F.broadcast(q), "qid").alias("p")
        e = pruned.alias("e")
        cand = p.join(
            e,
            (F.col("e.cell") == F.col("p.cell"))
            & (F.col("e.vec_id") != F.col("p.qid")),
        ).select(
            F.col("p.qid").alias("qid"),
            F.col("e.vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("p.qv"), F.col("e.embedding")), 6).alias("cos_sim"),
        )
        out = topk_per_group(
            cand, "qid", [F.desc("cos_sim"), F.asc("neighbor_id")], 5, rn_col="rn"
        )
        # the search leg IS the scale story (PartitionFilters over the
        # probed cells) — expose it to the EXPLAINS dump, which the
        # returned (localized) DataFrame can't show
        capture_plan("emb_ivf_persisted_index_search/search_leg", out)
        # result-sized localization before the index tmpdir goes away
        pdf = out.toPandas()
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return spark.createDataFrame(
        pdf, "qid long, neighbor_id long, cos_sim double, rn int"
    )

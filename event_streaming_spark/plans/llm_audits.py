"""Round-8 LLM-pipeline audits: int8 scalar-quantization recall, vocab
coverage (OOV rate), and exact containment detection.

* ``emb_int8_scalar_quant_recall`` — the SERVING-side complement of the
  PQ family: scalar (per-dimension affine) int8 quantization is what
  FAISS ``SQ8`` / most vector DBs ship as the cheap memory-4× option;
  the audit measures recall@10 of quantized search against exact
  search.  Everything is exact integer arithmetic (µ-scaled longs,
  floor-division codes), so both engines rank identically and the
  driver's value-hash pins the whole codec.
* ``text_vocab_oov_rate`` — tokenizer/vocab coverage: build the top-K
  corpus vocabulary, report per-source out-of-vocabulary ppm.  The
  pre-flight check before committing a tokenizer to a data mix; OOV
  spikes localize sources that need vocab or filtering work.
* ``docs_containment_prefix_join`` — asymmetric set CONTAINMENT
  C(A,B) = |A∩B| / |A| ≥ t: the quote/sub-document detector (a near-dup
  of a 10-line doc hiding inside a 10k-line doc has tiny Jaccard but
  containment ≈ 1).  Prefix-filtered like the Jaccard join, with the
  containment-specific pigeonhole: A's |A| − ⌈t·|A|⌉ + 1 globally
  rarest shingles must hit B, so the candidate join is A-prefix ×
  full-index on RARE keys only — bucket sizes bounded by the prefix
  shingle's document frequency, never the 'the'-bucket.

Late-session additions (same audit discipline):

* ``dedup_minhash_estimator_calibration`` — the 16-permutation
  estimator measured against EXACT Jaccard on every LSH candidate pair
  (ppm |error| histogram); costs exactly the verify stage it
  calibrates.
* ``docs_kanon_quasi_identifier_risk`` — k-anonymity suppression report
  over the (lang, source, length-bucket) quasi-identifier tuple for
  k ∈ {2, 5, 10}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import sql_normalize_text
from event_streaming_spark.operators import similarity as S
from event_streaming_spark.operators.materialize import materialize
from event_streaming_spark.functions.localframe import local_frame
from event_streaming_spark.plans.catalog import capture_plan, load, register, spread

# ---------------------------------------------------------------------------
# int8 scalar quantization recall audit
# Scale: per-dim min/max is one narrow pass (64 groups); codes are a
# per-row transform (no shuffle); search is broadcast-queries × one
# corpus scan for each leg; ranks via two-stage top-k.  At 100 TB the
# corpus never shuffles — exactly the brute-force baseline's shape, run
# twice (exact ints vs dequantized ints).
# ---------------------------------------------------------------------------

_SQ8_K = 10
_SQ8_NQ = 5

_SQ8_ORACLE = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * 1000000) AS BIGINT)) AS vq
  FROM embeddings
), x AS (
  SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e
), d AS (
  SELECT pos, min(v) AS mn, max(v) AS mx FROM x GROUP BY pos
), code AS (
  SELECT x.vec_id, x.pos, d.mn, d.mx,
         CASE WHEN d.mx = d.mn THEN 0
              ELSE ((x.v - d.mn) * 255) // (d.mx - d.mn) END AS c
  FROM x JOIN d USING (pos)
), deq AS (
  SELECT vec_id, pos, mn + (c * (mx - mn)) // 255 AS dv FROM code
), ed AS (
  SELECT qa.vec_id AS qid, xb.vec_id AS nid, sum(qa.v * xb.v) AS dot
  FROM x qa JOIN x xb ON qa.pos = xb.pos
  WHERE qa.vec_id < {_SQ8_NQ} AND xb.vec_id <> qa.vec_id
  GROUP BY qa.vec_id, xb.vec_id
), qd AS (
  SELECT qa.vec_id AS qid, xb.vec_id AS nid, sum(qa.dv * xb.dv) AS dot
  FROM deq qa JOIN deq xb ON qa.pos = xb.pos
  WHERE qa.vec_id < {_SQ8_NQ} AND xb.vec_id <> qa.vec_id
  GROUP BY qa.vec_id, xb.vec_id
), etop AS (
  SELECT qid, nid FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rn
    FROM ed) WHERE rn <= {_SQ8_K}
), qtop AS (
  SELECT qid, nid FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rn
    FROM qd) WHERE rn <= {_SQ8_K}
)
SELECT e.qid AS qid,
       cast(count(q.nid) AS BIGINT) AS n_overlap,
       cast(count(q.nid) * 1000000 // {_SQ8_K} AS BIGINT) AS recall_ppm
FROM etop e LEFT JOIN qtop q ON e.qid = q.qid AND e.nid = q.nid
GROUP BY e.qid ORDER BY qid
"""


@register(
    "emb_int8_scalar_quant_recall",
    _SQ8_ORACLE,
    tags=("llm", "ann", "quantization", "audit"),
)
def emb_int8_scalar_quant_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import topk_per_group

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
        ).alias("vq"),
    )
    # per-dim min/max: one narrow pass, 64 groups, collected as literals
    dims = (
        emb.select(F.posexplode("vq").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("pos")
        .collect()
    )
    mn = [int(r["mn"]) for r in dims]
    span = [int(r["mx"]) - int(r["mn"]) for r in dims]
    mn_arr = F.array(*[F.lit(v) for v in mn])
    span_arr = F.array(*[F.lit(v) for v in span])

    def dequant(col):
        # code = ((v - mn) * 255) div span; dq = mn + (code * span) div 255
        # — all nonnegative numerators, so long-cast truncation == floor
        # (identical to DuckDB's // on the same nonnegative ints).
        def f(x, i):
            m = F.element_at(mn_arr, i + 1)
            s = F.element_at(span_arr, i + 1)
            c = F.when(s == 0, F.lit(0)).otherwise(
                ((x - m) * 255 / s).cast("long")
            )
            return m + (c * s / 255).cast("long")

        return F.transform(col, f)

    both = emb.withColumn("dq", dequant(F.col("vq")))
    q = both.where(F.col("vec_id") < _SQ8_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("vq").alias("q_vq"),
        F.col("dq").alias("q_dq"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = both.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("nid"),
        dot(F.col("q_vq"), F.col("vq")).alias("edot"),
        dot(F.col("q_dq"), F.col("dq")).alias("qdot"),
    )
    scored = materialize(scored, name="sq8-scored")  # two rank legs, one scan
    etop = topk_per_group(
        scored, "qid", [F.col("edot").desc(), F.col("nid")], _SQ8_K, rn_col="rn"
    ).select("qid", "nid")
    qtop = topk_per_group(
        scored, "qid", [F.col("qdot").desc(), F.col("nid")], _SQ8_K, rn_col="rn"
    ).select("qid", F.col("nid").alias("q_nid"))
    return (
        etop.join(
            qtop,
            (etop.qid == qtop.qid) & (etop.nid == qtop.q_nid),
            "left",
        )
        .groupBy(etop.qid.alias("qid"))
        .agg(
            F.count("q_nid").alias("n_overlap"),
            (F.count("q_nid") * 1_000_000 / _SQ8_K).cast("long").alias("recall_ppm"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# Vocab coverage / OOV rate
# Scale: word-count shuffle (the canonical one), vocab rank via the
# DISTRIBUTED global row number (operators/ranks.py — a 10⁸-term
# vocabulary never sorts on one task), then a broadcast semi-join of the
# config-sized vocab against the token stream.
# ---------------------------------------------------------------------------

_VOCAB_K = 1000

_OOV_ORACLE = f"""
WITH t AS (
  SELECT source, unnest(string_split({sql_normalize_text('text')}, ' ')) AS term
  FROM documents
), c AS (
  SELECT term, count(*) AS n FROM t GROUP BY term
), vocab AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY n DESC, term) AS rn FROM c
  ) WHERE rn <= {_VOCAB_K}
)
SELECT t.source AS source,
       cast(count(*) AS BIGINT) AS n_tokens,
       cast(count(*) FILTER (WHERE v.term IS NULL) AS BIGINT) AS n_oov,
       cast(count(*) FILTER (WHERE v.term IS NULL) * 1000000 // count(*)
            AS BIGINT) AS oov_ppm
FROM t LEFT JOIN vocab v ON t.term = v.term
GROUP BY t.source ORDER BY source
"""


@register(
    "text_vocab_oov_rate",
    _OOV_ORACLE,
    tags=("llm", "text", "tokenizer", "audit"),
)
def text_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.hashing import tokens as tok_fn
    from event_streaming_spark.operators.ranks import with_global_row_number

    docs = spread(load(spark, sf_dir, "documents"))
    stream = materialize(
        docs.select("source", F.explode(tok_fn(F.col("text"))).alias("term")),
        name="oov-stream",
    )
    counts = stream.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    ranked, _ = with_global_row_number(
        counts, [F.desc("n"), F.asc("term")], "rn"
    )
    vocab = ranked.where(F.col("rn") <= _VOCAB_K).select("term")
    joined = stream.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "term", "left"
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("__in").isNull(), 1)).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            ((F.col("n_oov") * 1_000_000) / F.col("n_tokens"))
            .cast("long")
            .alias("oov_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Exact containment join (quote / sub-document detection)
# Runs over exact-dedup REPRESENTATIVES (min doc_id per distinct text) —
# the curation-pipeline ordering: exact dedup is stage 1
# (corpus_curation_end_to_end), so the containment detector never
# re-discovers the identical-text cliques; candidate volume scales with
# UNIQUE content.  The oracle states the same spec.
# ---------------------------------------------------------------------------

# containment threshold t = C_NUM / C_DEN = 4/5
_C_NUM, _C_DEN = 4, 5

_CONTAIN_ORACLE = f"""
WITH reps AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), docs AS (
  SELECT d.doc_id, d.text FROM documents d JOIN reps USING (doc_id)
), hs AS (
  SELECT doc_id, {S.sql_shingle_hashes('text')} AS hs FROM docs
), tok AS (
  SELECT DISTINCT doc_id, unnest(hs) AS sh FROM hs
), sz AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), dfreq AS (
  SELECT sh, count(*) AS dfc FROM tok GROUP BY sh
), ranked AS (
  SELECT t.doc_id, t.sh, s.n,
         row_number() OVER (PARTITION BY t.doc_id ORDER BY d.dfc, t.sh) AS rn
  FROM tok t JOIN dfreq d USING (sh) JOIN sz s USING (doc_id)
), prefix AS (
  SELECT doc_id, sh FROM ranked
  WHERE rn <= n - ({_C_NUM} * n + {_C_DEN} - 1) // {_C_DEN} + 1
), cand AS (
  SELECT DISTINCT p.doc_id AS doc_a, t.doc_id AS doc_b
  FROM prefix p JOIN tok t ON p.sh = t.sh AND p.doc_id <> t.doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, sa.n AS na, count(*) AS n_common
  FROM cand c
  JOIN sz sa ON sa.doc_id = c.doc_a
  JOIN tok ta ON ta.doc_id = c.doc_a
  JOIN tok tb ON tb.doc_id = c.doc_b AND tb.sh = ta.sh
  GROUP BY c.doc_a, c.doc_b, sa.n
)
SELECT doc_a, doc_b, n_common, na,
       cast(n_common * 1000000 // na AS BIGINT) AS containment_ppm
FROM inter
WHERE {_C_DEN} * n_common >= {_C_NUM} * na
ORDER BY doc_a, doc_b
"""


@register(
    "docs_containment_prefix_join",
    _CONTAIN_ORACLE,
    tags=("llm", "dedup", "join", "scale"),
)
def docs_containment_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered pairs (a, b) with |shingles(a) ∩ shingles(b)| ≥ t·|shingles(a)|.

    Pigeonhole for the candidate step: if A∩B misses ALL of A's
    |A| − ⌈t·|A|⌉ + 1 rarest shingles, then |A∩B| ≤ ⌈t·|A|⌉ − 1 < t·|A| —
    so joining A-prefixes against the full index finds every qualifying
    ordered pair.  The full-index side is only probed at the prefix's
    RARE keys (bucket size = that shingle's document frequency)."""
    docs = spread(load(spark, sf_dir, "documents"))
    reps = (
        docs.select("doc_id", F.md5("text").alias("g"))
        .groupBy("g")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    uniq = docs.join(reps, "doc_id").select("doc_id", "text")
    sets = materialize(
        uniq.select(
            "doc_id",
            F.array_distinct(S.shingle_hashes(F.col("text"))).alias("hs"),
        ).withColumn("n", F.size("hs")),
        name="contain-sets",
    )
    tok = sets.select("doc_id", "n", F.explode("hs").alias("sh"))
    dfreq = tok.groupBy("sh").agg(F.count(F.lit(1)).alias("dfc"))
    ranked = tok.join(dfreq, "sh").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("dfc", "sh")),
    )
    plen = F.col("n") - F.expr(f"({_C_NUM} * n + {_C_DEN} - 1) div {_C_DEN}") + 1
    prefix = ranked.where(F.col("rn") <= plen).select("doc_id", "sh")
    cand = (
        prefix.alias("p")
        .join(
            tok.select("doc_id", "sh").alias("t"),
            (F.col("p.sh") == F.col("t.sh"))
            & (F.col("p.doc_id") != F.col("t.doc_id")),
        )
        .select(
            F.col("p.doc_id").alias("doc_a"), F.col("t.doc_id").alias("doc_b")
        )
        .distinct()
    )
    verified = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("hs").alias("ha"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ha", "hb")).alias("n_common"),
            "na",
        )
        .where(_C_DEN * F.col("n_common") >= _C_NUM * F.col("na"))
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "n_common",
        "na",
        ((F.col("n_common") * 1_000_000) / F.col("na")).cast("long").alias(
            "containment_ppm"
        ),
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# MMR (maximal marginal relevance) diversified top-k retrieval — the
# diversity-aware re-ranker every few-shot/example-selection pipeline
# runs after ANN: greedily pick the candidate maximizing
# λ·rel(q,d) − (1−λ)·max_{s∈selected} sim(d,s).  λ = 7/10 and all
# scores are integer dot products of µ-scaled vectors, so the greedy
# argmax (ties → smallest vec_id) is bit-deterministic in both engines
# and the oracle can replay the k=3 selection as chained CTEs.
#
# Scale: relevance is the broadcast-query one-corpus-scan dot; each MMR
# step joins candidates against the SELECTED set (≤ k−1 vectors,
# broadcast as literals) and takes a distributed argmax
# (two-stage top-1) — the greedy loop is O(k) scans, k config-bounded,
# with the corpus never shuffling.
# ---------------------------------------------------------------------------

_MMR_K = 3
_MMR_NQ = 5
# λ = 7/10: score_scaled = 7·rel − 3·maxsim (both int dots, ×10 overall)
_MMR_LN, _MMR_LD = 7, 3


def _mmr_oracle() -> str:
    pre = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * 1000000) AS BIGINT)) AS vq
  FROM embeddings
), x AS (
  SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e
), rel AS (
  SELECT qa.vec_id AS qid, xb.vec_id AS d, sum(qa.v * xb.v) AS r
  FROM x qa JOIN x xb ON qa.pos = xb.pos
  WHERE qa.vec_id < {_MMR_NQ} AND xb.vec_id <> qa.vec_id
  GROUP BY qa.vec_id, xb.vec_id
), sel1 AS (
  SELECT qid, d FROM (
    SELECT qid, d, row_number() OVER (
      PARTITION BY qid ORDER BY {_MMR_LN} * r DESC, d) AS rn
    FROM rel) WHERE rn = 1
)"""
    steps = []
    for step in (2, 3):
        union = " UNION ALL ".join(
            f"SELECT qid, d FROM sel{i}" for i in range(1, step)
        )
        steps.append(f"""
, selu{step} AS (
  {union}
), pen{step} AS (
  SELECT r.qid, r.d, max(sum_ab.s) AS maxsim
  FROM rel r JOIN (
    SELECT s.qid, xb.vec_id AS b, sum(xa.v * xb.v) AS s
    FROM selu{step} s
    JOIN x xa ON xa.vec_id = s.d
    JOIN x xb ON xb.pos = xa.pos
    GROUP BY s.qid, s.d, xb.vec_id
  ) sum_ab ON sum_ab.qid = r.qid AND sum_ab.b = r.d
  WHERE NOT EXISTS (
    SELECT 1 FROM selu{step} u WHERE u.qid = r.qid AND u.d = r.d)
  GROUP BY r.qid, r.d
), sel{step} AS (
  SELECT qid, d FROM (
    SELECT p.qid, p.d, row_number() OVER (
      PARTITION BY p.qid
      ORDER BY {_MMR_LN} * r.r - {_MMR_LD} * p.maxsim DESC, p.d) AS rn
    FROM pen{step} p JOIN rel r ON r.qid = p.qid AND r.d = p.d
  ) WHERE rn = 1
)""")
    return (
        pre
        + "".join(steps)
        + """
SELECT qid, 1 AS rank, d AS vec_id FROM sel1
UNION ALL SELECT qid, 2, d FROM sel2
UNION ALL SELECT qid, 3, d FROM sel3
ORDER BY qid, rank
"""
    )


@register(
    "emb_mmr_diversified_topk",
    _mmr_oracle(),
    tags=("llm", "ann", "rerank", "diversity"),
)
def emb_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import topk_per_group

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
        ).alias("vq"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    q = emb.where(F.col("vec_id") < _MMR_NQ).select(
        F.col("vec_id").alias("qid"), F.col("vq").alias("q_vq")
    )
    rel = materialize(
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
            "qid", F.col("vec_id").alias("d"), "vq", dot("q_vq", "vq").alias("r")
        ),
        name="mmr-rel",
    )

    # greedy selection: k distributed argmax passes, selected vectors
    # broadcast back as a tiny literal table each step
    sel_rows: list = []  # (qid, rank, d)
    sel_vecs: dict = {}  # qid -> list[(d, vq)]
    for rank in range(1, _MMR_K + 1):
        if rank == 1:
            scored = rel.select("qid", "d", (_MMR_LN * F.col("r")).alias("s"))
        else:
            sel_df = F.broadcast(
                local_frame(spark, 
                    [
                        (qid, d, vq)
                        for qid, pairs in sel_vecs.items()
                        for d, vq in pairs
                    ],
                    "qid long, sd long, svq array<bigint>",
                )
            )
            remaining = rel.join(
                sel_df.select("qid", F.col("sd").alias("d")), ["qid", "d"], "left_anti"
            )
            pen = (
                remaining.join(sel_df, "qid")
                .select("qid", "d", "r", dot("vq", "svq").alias("sim"))
                .groupBy("qid", "d")
                .agg(
                    F.first("r").alias("r"), F.max("sim").alias("maxsim")
                )
            )
            scored = pen.select(
                "qid",
                "d",
                (_MMR_LN * F.col("r") - _MMR_LD * F.col("maxsim")).alias("s"),
            )
            if rank == 2:
                # the scale-relevant INTERNAL plan: candidates × broadcast
                # selected-set penalty join (the returned DF is the
                # collected k×NQ selection rows)
                capture_plan("emb_mmr_diversified_topk/penalty_step", scored)
        top = topk_per_group(
            scored, "qid", [F.col("s").desc(), F.col("d")], 1, rn_col="rn"
        ).select("qid", "d")
        picked = {r["qid"]: r["d"] for r in top.collect()}  # ≤ NQ rows
        vecs = {
            r["qid"]: r["vq"]
            for r in rel.join(
                F.broadcast(
                    local_frame(spark, list(picked.items()), "qid long, d long")
                ),
                ["qid", "d"],
            )
            .select("qid", "vq")
            .collect()
        }
        for qid, d in picked.items():
            sel_rows.append((qid, rank, d))
            sel_vecs.setdefault(qid, []).append((d, list(vecs[qid])))
    return local_frame(spark, 
        sorted(sel_rows), "qid long, rank int, vec_id long"
    ).orderBy("qid", "rank")


# ---------------------------------------------------------------------------
# kNN leave-one-out label accuracy — the embedding-quality eval every
# labeled corpus gets before the embeddings are trusted for dedup or
# retrieval: predict each vector's label by 5-NN majority vote (exact
# integer dots; vote ties → smallest label) and report per-label
# accuracy.  Brute all-pairs here is the EVAL shape (run on a held-out
# sample); at corpus scale the candidate generation is the IVF/LSH path
# already in the catalog — this query is the audit those serve.
# ---------------------------------------------------------------------------

_KNN_K = 5

_KNN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> cast(round(x * 1000000) AS BIGINT)) AS vq
  FROM embeddings
), x AS (
  SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e
), d AS (
  SELECT xa.vec_id AS a, xb.vec_id AS bid, sum(xa.v * xb.v) AS dot
  FROM x xa JOIN x xb ON xa.pos = xb.pos AND xa.vec_id <> xb.vec_id
  GROUP BY xa.vec_id, xb.vec_id
), top AS (
  SELECT a, bid FROM (
    SELECT a, bid, row_number() OVER (
      PARTITION BY a ORDER BY dot DESC, bid) AS rn
    FROM d) WHERE rn <= {_KNN_K}
), votes AS (
  SELECT t.a, e.label, count(*) AS cnt
  FROM top t JOIN e ON e.vec_id = t.bid
  GROUP BY t.a, e.label
), pred AS (
  SELECT a, label AS pred_label FROM (
    SELECT a, label, row_number() OVER (
      PARTITION BY a ORDER BY cnt DESC, label) AS rn
    FROM votes) WHERE rn = 1
)
SELECT e.label AS label,
       cast(count(*) AS BIGINT) AS n,
       cast(count(*) FILTER (WHERE p.pred_label = e.label) AS BIGINT)
         AS n_correct,
       cast(count(*) FILTER (WHERE p.pred_label = e.label) * 1000000
            // count(*) AS BIGINT) AS acc_ppm
FROM e JOIN pred p ON p.a = e.vec_id
GROUP BY e.label ORDER BY label
"""


@register(
    "emb_knn_leave_one_out_accuracy",
    _KNN_ORACLE,
    tags=("llm", "ann", "eval", "audit"),
)
def emb_knn_leave_one_out_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import topk_per_group

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
        ).alias("vq"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    a = emb.select(
        F.col("vec_id").alias("a"), F.col("label").alias("true_label"),
        F.col("vq").alias("avq"),
    )
    b = emb.select(
        F.col("vec_id").alias("bid"), F.col("label").alias("b_label"),
        F.col("vq").alias("bvq"),
    )
    scored = a.join(F.broadcast(b), F.col("a") != F.col("bid")).select(
        "a", "true_label", "bid", "b_label", dot("avq", "bvq").alias("dot")
    )
    top = topk_per_group(
        scored, "a", [F.col("dot").desc(), F.col("bid")], _KNN_K, rn_col="rn"
    )
    votes = top.groupBy("a", "true_label", "b_label").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    pred = topk_per_group(
        votes.withColumnRenamed("b_label", "pred_label").select(
            "a", "true_label", "pred_label", "cnt"
        ),
        "a",
        [F.col("cnt").desc(), F.col("pred_label")],
        1,
        rn_col="rn",
    )
    return (
        pred.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("pred_label") == F.col("true_label"), 1)).alias(
                "n_correct"
            ),
        )
        .select(
            "label",
            "n",
            "n_correct",
            ((F.col("n_correct") * 1_000_000) / F.col("n")).cast("long").alias(
                "acc_ppm"
            ),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# MinHash estimator CALIBRATION: before trusting "est_jaccard >= 0.3" as
# a dedup threshold, measure the 16-permutation estimator against EXACT
# Jaccard on every LSH candidate pair (no threshold — the spread below
# the cut is exactly what calibration needs) and report the |error|
# histogram.  All integer ppm arithmetic, so the histogram is
# hash-exact across engines.
# Scale: candidates are band-collision-bounded (the LSH contract);
# exact Jaccard costs one array_intersect per CANDIDATE pair — the
# audit is exactly as expensive as the verify stage it calibrates.
# ---------------------------------------------------------------------------


def _calib_oracle() -> str:
    eq_sum = " + ".join(
        f"(CASE WHEN sa.mh{i:02d} = sb.mh{i:02d} THEN 1 ELSE 0 END)"
        for i in range(S.MINHASH_K)
    )
    return f"""
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
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id
), scored AS (
  SELECT c.doc_a, c.doc_b,
         ({eq_sum}) * 1000000 // {S.MINHASH_K} AS est_ppm,
         len(list_intersect(ha.hs, hb.hs)) * 1000000
           // len(list_distinct(list_concat(ha.hs, hb.hs))) AS exact_ppm
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b
  JOIN hs ha ON ha.doc_id = c.doc_a
  JOIN hs hb ON hb.doc_id = c.doc_b
), err AS (
  SELECT abs(est_ppm - exact_ppm) AS e FROM scored
)
SELECT CASE WHEN e <= 20000 THEN 'a_<=2pct'
            WHEN e <= 50000 THEN 'b_2-5pct'
            WHEN e <= 100000 THEN 'c_5-10pct'
            ELSE 'd_>10pct' END AS err_bucket,
       cast(count(*) AS BIGINT) AS n_pairs,
       cast(sum(e) // count(*) AS BIGINT) AS mean_abs_err_ppm
FROM err GROUP BY 1 ORDER BY 1
"""


@register(
    "dedup_minhash_estimator_calibration",
    _calib_oracle(),
    tags=("llm", "dedup", "sketch", "audit"),
    bench=True,  # r8: heaviest session addition — tracked round-over-round
)
def dedup_minhash_estimator_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    hs = materialize(
        docs.select("doc_id", S.shingle_hashes(F.col("text")).alias("hs")),
        name="calib-shingles",
    )
    sig = hs.select("doc_id", F.array(*S.minhash_cols(F.col("hs"))).alias("sig"))
    sig = materialize(sig, name="calib-signatures")
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*S.band_hashes_over(F.col("sig")))).alias(
            "band_idx", "bh"
        ),
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
    eq = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    inter = F.size(F.array_intersect("ha", "hb"))
    union = F.size(F.array_distinct(F.concat("ha", "hb")))
    scored = (
        cand.join(
            sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa")),
            "doc_a",
        )
        .join(
            sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb")),
            "doc_b",
        )
        .join(hs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha")), "doc_a")
        .join(hs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb")), "doc_b")
        .select(
            ((eq * 1_000_000) / S.MINHASH_K).cast("long").alias("est_ppm"),
            ((inter * 1_000_000) / union).cast("long").alias("exact_ppm"),
        )
    )
    e = F.abs(F.col("est_ppm") - F.col("exact_ppm"))
    bucket = (
        F.when(e <= 20_000, F.lit("a_<=2pct"))
        .when(e <= 50_000, F.lit("b_2-5pct"))
        .when(e <= 100_000, F.lit("c_5-10pct"))
        .otherwise(F.lit("d_>10pct"))
    )
    return (
        scored.select(bucket.alias("err_bucket"), e.alias("e"))
        .groupBy("err_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.sum("e") / F.count(F.lit(1))).cast("long").alias("mean_abs_err_ppm"),
        )
        .orderBy("err_bucket")
    )


# ---------------------------------------------------------------------------
# k-ANONYMITY audit over quasi-identifiers: before releasing a corpus
# (or its metadata) the governance question is "how many rows sit in a
# quasi-identifier equivalence class smaller than k?" — those rows are
# re-identifiable by joining the QI tuple against an external table.
# QI here = (lang, source, 500-char length bucket); the report gives,
# for k ∈ {2, 5, 10}, the class count below k, the rows that would need
# suppression, and the suppression rate in exact ppm.
# Scale: ONE groupBy over the (bounded-domain) QI tuple; everything
# after runs on the classes-sized summary — the fact table is scanned
# once regardless of how many k thresholds are reported.
# ---------------------------------------------------------------------------

_KANON_ORACLE = """
WITH qi AS (
  SELECT lang, source, n_chars // 500 AS size_bucket,
         cast(count(*) AS BIGINT) AS g
  FROM documents GROUP BY 1, 2, 3
), tot AS (
  SELECT cast(sum(g) AS BIGINT) AS n_rows,
         cast(count(*) AS BIGINT) AS n_classes
  FROM qi
), ks AS (
  SELECT unnest([2, 5, 10]) AS k
)
SELECT ks.k,
       tot.n_classes,
       cast(coalesce(sum(CASE WHEN qi.g < ks.k THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS classes_below_k,
       cast(coalesce(sum(CASE WHEN qi.g < ks.k THEN qi.g ELSE 0 END), 0) AS BIGINT)
         AS rows_suppressed,
       cast(coalesce(sum(CASE WHEN qi.g < ks.k THEN qi.g ELSE 0 END), 0)
            * 1000000 // tot.n_rows AS BIGINT) AS suppressed_ppm
FROM ks CROSS JOIN tot CROSS JOIN qi
GROUP BY ks.k, tot.n_classes, tot.n_rows
ORDER BY ks.k
"""


@register(
    "docs_kanon_quasi_identifier_risk",
    _KANON_ORACLE,
    tags=("llm", "governance", "audit"),
)
def docs_kanon_quasi_identifier_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # Pin the classes-sized QI summary: the totals and the per-k rollup
    # both read it — unpinned, each branch re-scans the corpus.
    qi = materialize(
        docs.groupBy(
            "lang",
            "source",
            (F.col("n_chars") / 500).cast("long").alias("size_bucket"),
        ).agg(F.count(F.lit(1)).cast("long").alias("g")),
        name="kanon-qi-classes",
    )
    tot = qi.agg(
        F.sum("g").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
    )
    ks = docs.sparkSession.range(0, 3).select(
        F.element_at(F.array(F.lit(2), F.lit(5), F.lit(10)), (F.col("id") + 1).cast("int")).alias("k")
    )
    joined = ks.crossJoin(F.broadcast(tot)).crossJoin(qi)
    out = (
        joined.groupBy("k", "n_classes", "n_rows")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("g") < F.col("k"), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("classes_below_k"),
            F.coalesce(
                F.sum(F.when(F.col("g") < F.col("k"), F.col("g")).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("rows_suppressed"),
        )
        .select(
            "k",
            "n_classes",
            "classes_below_k",
            "rows_suppressed",
            ((F.col("rows_suppressed") * 1_000_000) / F.col("n_rows"))
            .cast("long")
            .alias("suppressed_ppm"),
        )
        .orderBy("k")
    )
    capture_plan("docs_kanon_quasi_identifier_risk", out)
    return out


# ---------------------------------------------------------------------------
# Binary (sign-bit) embedding quantization recall — the 64x-memory
# extreme of the quantization family (SQ8 above keeps 8 bits/dim; this
# keeps ONE).  64 dims pack into a single int64 signature; candidate
# distance is popcount(xor) — the cheapest ANN scoring primitive there
# is, and the reason binary codes are the standard first-stage filter
# in billion-scale retrieval (Hamming ranking + exact re-rank).  The
# audit measures symmetric-Hamming recall@10 against exact integer
# dot-product top-10 for the same 5 queries as the SQ8 audit.
# Scale: signature build is one narrow pass (no shuffle); the Hamming
# leg scans signatures (8 bytes/vector — 64 GB for 8 B vectors) with a
# broadcast query block; ranks via two-stage top-k.  Everything is
# exact integers; ties break on nid in both engines.
# ---------------------------------------------------------------------------

_BSQ_K = 10
_BSQ_NQ = 5
_BSQ_SIGN = -9223372036854775808  # bit 63 — the int64 sign bit

_BSQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * 1000000) AS BIGINT)) AS vq
  FROM embeddings
), x AS (
  SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e
), sig AS (
  SELECT vec_id,
         cast(sum(CASE WHEN v > 0 THEN
                    CASE WHEN pos = 1 THEN {_BSQ_SIGN}
                         ELSE (1::BIGINT << (64 - pos)) END
                  ELSE 0 END) AS BIGINT) AS s
  FROM x GROUP BY vec_id
), ed AS (
  SELECT qa.vec_id AS qid, xb.vec_id AS nid, sum(qa.v * xb.v) AS dot
  FROM x qa JOIN x xb ON qa.pos = xb.pos
  WHERE qa.vec_id < {_BSQ_NQ} AND xb.vec_id <> qa.vec_id
  GROUP BY qa.vec_id, xb.vec_id
), hd AS (
  SELECT q.vec_id AS qid, b.vec_id AS nid, bit_count(xor(q.s, b.s)) AS ham
  FROM sig q JOIN sig b ON b.vec_id <> q.vec_id
  WHERE q.vec_id < {_BSQ_NQ}
), etop AS (
  SELECT qid, nid FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rn
    FROM ed) WHERE rn <= {_BSQ_K}
), htop AS (
  SELECT qid, nid FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY ham ASC, nid) AS rn
    FROM hd) WHERE rn <= {_BSQ_K}
)
SELECT e.qid AS qid,
       cast(count(h.nid) AS BIGINT) AS n_overlap,
       cast(count(h.nid) * 1000000 // {_BSQ_K} AS BIGINT) AS recall_ppm
FROM etop e LEFT JOIN htop h ON h.qid = e.qid AND h.nid = e.nid
GROUP BY e.qid ORDER BY qid
"""


@register(
    "emb_binary_sign_hamming_recall",
    _BSQ_ORACLE,
    tags=("llm", "ann", "quantization", "audit"),
)
def emb_binary_sign_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import topk_per_group

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
        ).alias("vq"),
    )
    x = emb.select("vec_id", F.posexplode("vq").alias("pos0", "v"))
    # shiftleft's shift amount wraps mod 64, so a >64-dim embedding would
    # SILENTLY collide bits while the oracle's 128-bit HUGEINT diverges —
    # fail loudly instead (the branch is lazy: it only evaluates if a row
    # actually has pos0 > 63, i.e. the fixture dim changed).
    bit = (
        F.when(
            F.col("pos0") > 63,
            F.assert_true(
                F.lit(False),
                F.lit("emb_binary_sign_hamming_recall: embedding dim > 64 — "
                      "sign-bit signature would wrap; widen to multi-word first"),
            ).cast("long"),
        )
        .when(
            F.col("v") > 0,
            F.when(F.col("pos0") == 0, F.lit(_BSQ_SIGN).cast("long")).otherwise(
                F.expr("shiftleft(1L, 63 - pos0)")
            ),
        )
        .otherwise(F.lit(0).cast("long"))
    )
    sig = x.groupBy("vec_id").agg(F.sum(bit).cast("long").alias("s"))

    qs = sig.where(F.col("vec_id") < _BSQ_NQ).select(
        F.col("vec_id").alias("qid"), F.col("s").alias("qs")
    )
    hd = sig.join(F.broadcast(qs), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("nid"),
        F.bit_count(F.col("qs").bitwiseXOR(F.col("s"))).alias("ham"),
    )
    htop = topk_per_group(
        hd, "qid", [F.asc("ham"), F.asc("nid")], _BSQ_K, rn_col="rn"
    ).select(F.col("qid").alias("h_qid"), F.col("nid").alias("h_nid"))

    qv = emb.where(F.col("vec_id") < _BSQ_NQ).select(
        F.col("vec_id").alias("qid"), F.col("vq").alias("q_vq")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_vq"), F.col("vq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    ed = emb.join(F.broadcast(qv), F.col("vec_id") != F.col("qid")).select(
        "qid", F.col("vec_id").alias("nid"), dot.alias("dot")
    )
    etop = topk_per_group(
        ed, "qid", [F.desc("dot"), F.asc("nid")], _BSQ_K, rn_col="rn"
    ).select("qid", "nid")

    return (
        etop.join(
            htop,
            (F.col("qid") == F.col("h_qid")) & (F.col("nid") == F.col("h_nid")),
            "left",
        )
        .groupBy("qid")
        .agg(F.count("h_nid").cast("long").alias("n_overlap"))
        .select(
            "qid",
            "n_overlap",
            (F.col("n_overlap") * 1_000_000 / _BSQ_K).cast("long").alias(
                "recall_ppm"
            ),
        )
        .orderBy("qid")
    )

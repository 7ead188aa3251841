"""Round-10 embedding audits: the IVF nprobe tuning curve and per-label
centroid-distance outliers.

* ``emb_ivf_recall_vs_nprobe`` — recall@5 of the IVF two-stage ANN
  (plans/llm_similarity.py emb_ivf_two_stage_ann) against the exact
  brute-force top-5, swept over nprobe ∈ {1, 2, 3, 5}: the table an
  operator reads to pick nprobe, exactly as
  ``docs_minhash_band_tuning_curve`` does for (bands, rows).  The
  shipped query's nprobe=3 point sits ON this curve — publishing the
  curve is what justifies the setting.
* ``emb_label_centroid_outliers`` — per label cell: vectors whose
  squared distance to their own cell centroid exceeds 2× the cell
  mean (exact integer gate on µ-scaled distances).  The embedding
  data-quality audit: mislabeled/corrupt vectors surface as outliers,
  and cells with heavy tails are the ones IVF probes mis-serve.

100 TB shape: both queries broadcast the K-row centroid table and scan
the corpus once; the nprobe sweep bounds candidates by (max nprobe /
n_cells) of the corpus per query and ranks with the two-stage top-k
(operators/ranks.py — never one task per query id); the outlier audit
is two label-keyed aggregates over one distance pass (the per-label
mean joins back label-keyed, label-bounded).

Reference parity note: the reference engine has no vector surface
(SURVEY §2); these extend the ANN audit pack (plans/llm_audits*.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.localframe import local_frame
from event_streaming_spark.operators.ranks import topk_per_group
from event_streaming_spark.plans.catalog import load, register, spread

_NPROBES = (1, 2, 3, 5)
_TOPK = 5
_NQ = 10  # query vectors: vec_id < 10 (the brute-force baseline's set)

# cosine / centroid SQL fragments — phrased EXACTLY like the IVF oracle in
# plans/llm_similarity.py so both queries share one cross-engine definition
_SQL_CENT = """
  SELECT label, list(c ORDER BY dim) AS centroid FROM (
    SELECT label, d AS dim,
           cast(round(cast(sum(cast(embedding[d + 1] as decimal(30,10))) as double)
                      / count(*), 6) as double) AS c
    FROM embeddings, range(64) t(d)
    GROUP BY label, d
  ) GROUP BY label
"""


def _cos_sql(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) /"
        f" (sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) *"
        f"  sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))), 6)"
    )


_NPROBE_ORACLE = f"""
WITH cent AS MATERIALIZED ({_SQL_CENT}),
q AS MATERIALIZED (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {_NQ}
), scored AS MATERIALIZED (
  SELECT qid, label,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY {_cos_sql('q.qv', 'cent.centroid')} DESC, cent.label
         ) AS cell_rank
  FROM q, cent
), cand AS MATERIALIZED (
  SELECT s.qid, e.vec_id AS nid, s.cell_rank,
         {_cos_sql('q.qv', 'e.embedding')} AS cos_sim
  FROM scored s
  JOIN q USING (qid)
  JOIN embeddings e ON e.label = s.label AND e.vec_id <> s.qid
  WHERE s.cell_rank <= {max(_NPROBES)}
), ann AS MATERIALIZED (
  SELECT np, qid, nid FROM (
    SELECT t.np, c.qid, c.nid,
           row_number() OVER (PARTITION BY t.np, c.qid
                              ORDER BY c.cos_sim DESC, c.nid) AS rn
    FROM cand c JOIN (VALUES {", ".join(f"({p})" for p in _NPROBES)}) t(np)
                  ON c.cell_rank <= t.np
  ) WHERE rn <= {_TOPK}
), bf AS MATERIALIZED (
  SELECT qid, nid FROM (
    SELECT a.vec_id AS qid, b.vec_id AS nid,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {_cos_sql('a.embedding', 'b.embedding')} DESC,
                                       b.vec_id) AS rn
    FROM embeddings a JOIN embeddings b
      ON a.vec_id < {_NQ} AND b.vec_id <> a.vec_id
  ) WHERE rn <= {_TOPK}
), nq AS (SELECT cast(count(*) AS BIGINT) AS n_q FROM q)
SELECT cast(t.np AS BIGINT) AS nprobe,
       cast(coalesce(h.hits, 0) AS BIGINT) AS total_hits,
       cast(coalesce(h.hits, 0) * 1000000 // ({_TOPK} * nq.n_q) AS BIGINT)
         AS recall_ppm
FROM (VALUES {", ".join(f"({p})" for p in _NPROBES)}) t(np)
LEFT JOIN (
  SELECT ann.np, cast(count(*) AS BIGINT) AS hits
  FROM ann JOIN bf ON bf.qid = ann.qid AND bf.nid = ann.nid
  GROUP BY ann.np
) h ON h.np = t.np
CROSS JOIN nq
ORDER BY nprobe
"""


@register(
    "emb_ivf_recall_vs_nprobe",
    _NPROBE_ORACLE,
    tags=("llm", "ann", "ivf", "tuning", "audit"),
    bench=True,
)
def emb_ivf_recall_vs_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of IVF search vs exact brute force, per nprobe.

    Scale design: centroids broadcast (K rows); ONE candidate pass at
    the LARGEST nprobe carries each candidate's cell_rank, so the
    sweep is a bounded ≤|_NPROBES|× fanout of the already-cell-bounded
    candidate table, not |_NPROBES| corpus scans; both rankings use
    the two-stage top-k.  The brute-force leg is the audit's cost
    ceiling by definition (it IS the baseline being scored against).
    """
    from event_streaming_spark.plans.llm_similarity import (
        _ivf_centroids,
        cosine,
        emb_cosine_topk_bruteforce,
    )

    emb = load(spark, sf_dir, "embeddings")
    cent = _ivf_centroids(emb)
    q = emb.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = q.crossJoin(F.broadcast(cent)).select(
        "qid",
        "label",
        F.round(cosine(F.col("qv"), F.col("centroid")), 6).alias("csim"),
    )
    ranked_cells = topk_per_group(
        scored, "qid", [F.desc("csim"), F.asc("label")], max(_NPROBES),
        rn_col="cell_rank",
    ).select("qid", "label", "cell_rank")
    p = ranked_cells.join(F.broadcast(q), "qid").alias("p")
    e = emb.alias("e")
    cand = p.join(
        e,
        (F.col("e.label") == F.col("p.label"))
        & (F.col("e.vec_id") != F.col("p.qid")),
    ).select(
        F.col("p.qid").alias("qid"),
        F.col("e.vec_id").alias("nid"),
        F.col("p.cell_rank").alias("cell_rank"),
        F.round(cosine(F.col("p.qv"), F.col("e.embedding")), 6).alias("cos_sim"),
    )
    nps = F.explode(
        F.array(*[F.lit(p_).cast("long") for p_ in _NPROBES])
    ).alias("np")
    fanned = cand.select("*", nps).where(F.col("cell_rank") <= F.col("np"))
    keyed = fanned.withColumn("gk", F.concat_ws("|", "np", "qid"))
    ann = topk_per_group(
        keyed, "gk", [F.desc("cos_sim"), F.asc("nid")], _TOPK, rn_col="rn"
    ).select("np", "qid", "nid")
    bf = emb_cosine_topk_bruteforce(spark, sf_dir).select(
        F.col("qid").alias("b_qid"), F.col("neighbor_id").alias("b_nid")
    )
    hits = (
        ann.join(
            bf,
            (F.col("qid") == F.col("b_qid")) & (F.col("nid") == F.col("b_nid")),
        )
        .groupBy("np")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    nq = q.agg(F.count(F.lit(1)).cast("long").alias("n_q")).coalesce(1)
    npframe = local_frame(
        spark, [(int(p_),) for p_ in _NPROBES], "np long"
    ).coalesce(1)
    return (
        npframe.join(hits, "np", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            F.col("np").alias("nprobe"),
            F.coalesce("hits", F.lit(0)).cast("long").alias("total_hits"),
            F.expr(
                f"(coalesce(hits, 0) * CAST(1000000 AS BIGINT))"
                f" div ({_TOPK} * n_q)"
            )
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("nprobe")
    )


# ---------------------------------------------------------------------------
# Per-label centroid-distance outliers.
# ---------------------------------------------------------------------------

_OUTLIER_ORACLE = f"""
WITH cent AS MATERIALIZED ({_SQL_CENT}),
d2 AS MATERIALIZED (
  SELECT e.label,
         cast(round(list_sum(list_transform(generate_series(1, 64),
                i -> (e.embedding[i]::DOUBLE - cent.centroid[i])
                     * (e.embedding[i]::DOUBLE - cent.centroid[i])))
              * 1000000) AS BIGINT) AS d2_fp
  FROM embeddings e JOIN cent USING (label)
), stats AS (
  SELECT label, cast(count(*) AS BIGINT) AS n_vecs,
         cast(sum(d2_fp) // count(*) AS BIGINT) AS mean_d2_fp,
         cast(max(d2_fp) AS BIGINT) AS max_d2_fp
  FROM d2 GROUP BY label
)
SELECT s.label AS label, s.n_vecs, s.mean_d2_fp, s.max_d2_fp,
       cast(count(*) FILTER (WHERE d.d2_fp > 2 * s.mean_d2_fp) AS BIGINT)
         AS n_outliers
FROM d2 d JOIN stats s USING (label)
GROUP BY s.label, s.n_vecs, s.mean_d2_fp, s.max_d2_fp
ORDER BY label
"""


@register(
    "emb_label_centroid_outliers",
    _OUTLIER_ORACLE,
    tags=("llm", "embeddings", "quality", "audit"),
)
def emb_label_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors farther than 2× their cell's mean squared centroid
    distance, per label.

    Scale design: one corpus pass computes µ-scaled integer distances
    against the BROADCAST centroid table; the mean joins back
    label-keyed (label-bounded small side), so the outlier gate is a
    second pass over the same keyed aggregate — no window, no
    all-pairs.  The 2× integer gate (d2_fp > 2 * (sum div n)) is exact
    on both engines.
    """
    from event_streaming_spark.plans.llm_similarity import _ivf_centroids

    emb = load(spark, sf_dir, "embeddings")
    cent = _ivf_centroids(emb)
    diff2 = F.zip_with(
        F.col("embedding"),
        F.col("centroid"),
        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
    )
    d2 = emb.join(F.broadcast(cent), "label").select(
        "label",
        F.round(
            F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x) * 1_000_000
        )
        .cast("long")
        .alias("d2_fp"),
    )
    stats = d2.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.expr("sum(d2_fp) div count(*)").cast("long").alias("mean_d2_fp"),
        F.max("d2_fp").cast("long").alias("max_d2_fp"),
    )
    return (
        d2.join(stats, "label")
        .groupBy("label", "n_vecs", "mean_d2_fp", "max_d2_fp")
        .agg(
            F.sum(
                F.when(F.col("d2_fp") > 2 * F.col("mean_d2_fp"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# kNN hubness audit (Radovanović et al. 2010): in high dimensions a few
# "hub" points appear in a disproportionate share of other points'
# nearest-neighbor lists, silently dominating retrieval and dedup.
# k-occurrence N_k(x) = how many other vectors list x in their IVF top-3;
# the histogram's right tail is the pathology readout.
# ---------------------------------------------------------------------------

_HUB_K = 3
_HUB_CAP = 10  # histogram cap: occurrences >= cap collapse into one bucket
# Query-side sample target: the audit estimates the k-occurrence
# distribution from a DETERMINISTIC fixed-size query sample
# (vec_id % step == 0, step = greatest(1, n // _HUB_Q)), so the
# candidate volume is _HUB_Q x cell_size — linear in the corpus —
# instead of n x cell_size (quadratic, ~n^2/K with K fixed cells).
# At sf0.01 (500 vectors) step = 1, i.e. the sample IS the corpus and
# the result is identical to the exhaustive audit.
_HUB_Q = 2000

_HUB_ORACLE = f"""
WITH cent AS MATERIALIZED ({_SQL_CENT}),
qstep AS MATERIALIZED (
  SELECT greatest(1, count(*) // {_HUB_Q}) AS s FROM embeddings
),
home AS MATERIALIZED (
  SELECT qid, label FROM (
    SELECT e.vec_id AS qid, cent.label,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_cos_sql('e.embedding', 'cent.centroid')} DESC, cent.label
           ) AS rn
    FROM embeddings e, cent
    WHERE e.vec_id % (SELECT s FROM qstep) = 0
  ) WHERE rn = 1
), knn AS MATERIALIZED (
  SELECT qid, nid FROM (
    SELECT h.qid, e2.vec_id AS nid,
           row_number() OVER (
             PARTITION BY h.qid
             ORDER BY {_cos_sql('q.embedding', 'e2.embedding')} DESC, e2.vec_id
           ) AS rn
    FROM home h
    JOIN embeddings q ON q.vec_id = h.qid
    JOIN embeddings e2 ON e2.label = h.label AND e2.vec_id <> h.qid
  ) WHERE rn <= {_HUB_K}
), occ AS (
  SELECT e.vec_id,
         cast(coalesce(k.n, 0) AS BIGINT) AS n_occ
  FROM embeddings e
  LEFT JOIN (SELECT nid, cast(count(*) AS BIGINT) AS n FROM knn GROUP BY nid) k
    ON k.nid = e.vec_id
)
SELECT cast(least(n_occ, {_HUB_CAP}) AS BIGINT) AS k_occurrences,
       cast(count(*) AS BIGINT) AS n_vectors
FROM occ
GROUP BY least(n_occ, {_HUB_CAP})
ORDER BY k_occurrences
"""


@register(
    "emb_knn_hubness_audit",
    _HUB_ORACLE,
    tags=("llm", "ann", "quality", "audit"),
)
def emb_knn_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence histogram of the IVF-bounded 3-NN graph, estimated
    from a deterministic fixed-size query sample.

    Scale design: with K fixed cells, making EVERY vector a query is
    quadratic (n queries x n/K candidates each ~ n^2/K cosines — the
    salt join only spreads that work, it doesn't shrink it).  The
    audit therefore samples the QUERY side to a fixed target size:
    queries are vectors with vec_id % step == 0 where
    step = greatest(1, n // _HUB_Q), derived declaratively from one
    1-row aggregate (no driver-side count), so candidates =
    _HUB_Q x cell_size — linear in the corpus.  k-occurrence is a
    sample estimate of N_k(x) (standard for hubness audits: skew of
    the N_k distribution, not exact per-vector counts, is the
    readout); at sf0.01 step = 1 and the audit is exhaustive.  Each
    sampled query probes only its nearest centroid's cell, rankings
    via two-stage top-k, and the k-occurrence count is one keyed
    aggregate over the (_HUB_Q x k) edge list.  Output is a
    cap-bounded histogram (<= _HUB_CAP + 1 rows).
    """
    from event_streaming_spark.functions.numeric import dot, l2_norm
    from event_streaming_spark.plans.llm_similarity import (
        _ivf_centroids,
        cosine,
    )

    emb = load(spark, sf_dir, "embeddings")
    cent = _ivf_centroids(emb)
    # Deterministic query sample: step is ONE broadcast scalar row
    # computed inside the plan (count div target), so the sample stays
    # declarative and reproducible — no driver-side .count().
    qstep = emb.agg(
        F.greatest(F.lit(1).cast("long"), F.expr(f"count(1) div {_HUB_Q}"))
        .alias("qstep")
    )
    q_side = (
        emb.crossJoin(F.broadcast(qstep))
        .where(F.pmod(F.col("vec_id"), F.col("qstep")) == 0)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    )
    # Per-vector norms are computed ONCE, inline, BEFORE the salt
    # explode and the join: the pairwise cosine then costs one zip-fold
    # (the dot) instead of three — higher-order-function folds never
    # enter whole-stage codegen, so on a multi-million-candidate audit
    # the two redundant norm folds were ~2/3 of the stage (measured at
    # 10x).  l2_norm here is the SAME fold as inside cosine(), so the
    # doubles (and the hash gate) are bit-identical.
    scored = q_side.crossJoin(F.broadcast(cent.withColumnRenamed("label", "clabel"))).select(
        "qid",
        "qv",
        "clabel",
        F.round(cosine(F.col("qv"), F.col("centroid")), 6).alias("csim"),
    )
    home = topk_per_group(
        scored, "qid", [F.desc("csim"), F.asc("clabel")], 1, rn_col="rn"
    ).select("qid", "qv", F.col("clabel").alias("label"))
    # The query side is now a BOUNDED sample (<= ~_HUB_Q rows), so the
    # scale-correct join is to BROADCAST the queries and stream the
    # corpus exactly once: no shuffle of the big side at all, and the
    # cosine work parallelizes with the corpus scan itself (spread()
    # buys that parallelism on the single-row-group fixtures; a real
    # deployment gets it from file splits).  This replaces the r10
    # label+salt shuffle join — salting was only needed when BOTH
    # sides were corpus-sized; left to itself here Spark inverted the
    # build side and broadcast the salted CORPUS (160+ MB at 10x,
    # OOM-bound at 100x).  The candidate set is unchanged (same
    # label-cell membership, minus self), so the result is
    # byte-identical.
    e_s = spread(emb).select(
        "vec_id",
        "label",
        "embedding",
        l2_norm(F.col("embedding")).alias("e_nrm"),
    ).alias("e")
    h_s = home.select(
        "qid", "qv", "label", l2_norm(F.col("qv")).alias("q_nrm")
    ).alias("h")
    cand = e_s.join(
        F.broadcast(h_s),
        (F.col("e.label") == F.col("h.label"))
        & (F.col("e.vec_id") != F.col("h.qid")),
    ).select(
        F.col("h.qid").alias("qid"),
        F.col("e.vec_id").alias("nid"),
        F.round(
            dot(F.col("h.qv"), F.col("e.embedding"))
            / (F.col("h.q_nrm") * F.col("e.e_nrm")),
            6,
        ).alias("cos_sim"),
    )
    knn = topk_per_group(
        cand, "qid", [F.desc("cos_sim"), F.asc("nid")], _HUB_K, rn_col="rn"
    ).select("qid", "nid")
    occ_counts = knn.groupBy("nid").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    occ = emb.select("vec_id").join(
        occ_counts.withColumnRenamed("nid", "vec_id"), "vec_id", "left"
    ).select(F.coalesce("n", F.lit(0)).cast("long").alias("n_occ"))
    return (
        occ.groupBy(
            F.least(F.col("n_occ"), F.lit(_HUB_CAP))
            .cast("long")
            .alias("k_occurrences")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("k_occurrences")
    )


# ---------------------------------------------------------------------------
# PQ distortion vs subspace count — the third tuning curve of the ANN
# family (bands x rows for MinHash LSH, nprobe for IVF, m for PQ):
# quantization error against the code length the engine would store.
# Same deterministic construction as emb_pq_encode (plans/curation3.py):
# mu-scaled integer vectors, codebook = the first 8 vectors, exact
# integer L2 per subspace — only the subspace count m sweeps.
# ---------------------------------------------------------------------------

_PQD_MS = (2, 4, 8, 16)
_PQD_K = 8       # codebook entries (seeds: vec_id < 8), fixed across the sweep
_PQD_DIM = 64
_PQD_SCALE = 1000  # the _KM_SCALE quantization used by the PQ family


def _pqd_oracle() -> str:
    blocks = []
    for m in _PQD_MS:
        dsub = _PQD_DIM // m
        blocks.append(f"""
  SELECT cast({m} AS BIGINT) AS m, cast({dsub} AS BIGINT) AS dsub,
         cast(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
         cast(sum(dist) AS BIGINT) AS total_err,
         cast(sum(dist) // count(DISTINCT vec_id) AS BIGINT) AS err_per_vec
  FROM (
    SELECT vec_id, s, dist FROM (
      SELECT d.vec_id, d.s, d.dist,
             row_number() OVER (PARTITION BY d.vec_id, d.s
                                ORDER BY d.dist, d.seed) AS rn
      FROM (SELECT e.vec_id, cb.seed, (e.pos - 1)//{dsub} AS s,
                   sum((e.v - cb.cv)*(e.v - cb.cv)) AS dist
            FROM e JOIN cb ON e.pos = cb.pos GROUP BY 1, 2, 3) d
    ) WHERE rn = 1
  )""")
    union = "\n  UNION ALL\n".join(blocks)
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
             x -> cast(floor(cast(x as double)*{_PQD_SCALE} + 0.5) as bigint)) AS q
  FROM embeddings
),
e AS MATERIALIZED (
  SELECT vec_id, unnest(range(1, {_PQD_DIM + 1})) AS pos, unnest(q) AS v FROM q
),
cb AS MATERIALIZED (
  SELECT vec_id AS seed, pos, v AS cv FROM e WHERE vec_id < {_PQD_K}
)
SELECT * FROM ({union})
ORDER BY m
"""


@register(
    "emb_pq_distortion_vs_m",
    _pqd_oracle(),
    tags=("llm", "ann", "quantization", "tuning"),
)
def emb_pq_distortion_vs_m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total/per-vector PQ quantization error per subspace count m.

    Scale design: the codebook broadcasts (8 rows); per-m subspace
    distances are zip_with/aggregate folds over slices inside codegen
    (the corpus never shuffles to score); each m contributes one
    (vec, s) argmin with map-side combine and ONE-row rollup, and the
    four m-values union at the 4-row frame — the sweep never re-reads
    the parquet (one shared quantized scan feeds all four branches).
    """
    from event_streaming_spark.operators.materialize import materialize

    emb = load(spark, sf_dir, "embeddings")
    qdf = materialize(
        emb.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * _PQD_SCALE + F.lit(0.5)).cast(
                    "long"
                ),
            ).alias("q"),
        ),
        name="pqd-quantized",
    )
    codebook = qdf.filter(F.col("vec_id") < _PQD_K).select(
        F.col("vec_id").cast("int").alias("seed"), F.col("q").alias("c")
    )
    def _sub_dist(dsub):
        # closure, NOT a default arg: F.transform reads the callback's
        # arity from its signature, and a second parameter (even
        # defaulted) makes it pass (element, INDEX) — the index would
        # silently clobber dsub (the graph.py _permute lesson).
        def sub(s):
            a = F.slice(F.col("q"), s * dsub + 1, dsub)
            b = F.slice(F.col("c"), s * dsub + 1, dsub)
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )

        return sub

    outs = []
    for m in _PQD_MS:
        dsub = _PQD_DIM // m
        subd = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), _sub_dist(dsub))
        scored = qdf.crossJoin(F.broadcast(codebook)).select(
            "vec_id", "seed", F.posexplode(subd).alias("s", "dist")
        )
        best = scored.groupBy("vec_id", "s").agg(
            F.min(F.struct("dist", "seed")).alias("mn")
        )
        outs.append(
            best.agg(
                F.lit(m).cast("long").alias("m"),
                F.lit(dsub).cast("long").alias("dsub"),
                F.countDistinct("vec_id").cast("long").alias("n_vecs"),
                F.sum("mn.dist").cast("long").alias("total_err"),
                F.expr("sum(mn.dist) div count(DISTINCT vec_id)")
                .cast("long")
                .alias("err_per_vec"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("m")

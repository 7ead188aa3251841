"""Video frame-level dedup under the ORACLE gate — the multimodal ×
dedup composition for VIDEO: per-document MJPEG videos are synthesized
with the in-repo JPEG encoder + AVI muxer, demuxed back frame by frame
(RIFF walk), every frame REALLY decoded (baseline JPEG, stdlib+numpy)
and perceptually hashed (operators/phash.py), and videos sharing frames
are paired by an equi-join on the 64-bit frame hash — the standard
"find re-uploads / clips of the same footage" pipeline.

Differential design (same family as multimodal_phash_roundtrip and
multimodal_jpeg_decode_stats): each video's 3 frames are 32×32 images —
a 4×4 grid of uniform even-valued 8×8 blocks (16 cells of hash entropy,
so unrelated videos essentially never collide) derived from the MinHash
signature of the document's RESIDUE-CLASS representative (doc_id %
_VD_GROUPS), so (a) videos within a residue class share all 3 frames —
real duplicate structure for the join to find — and (b) DuckDB predicts
every frame hash ARITHMETICALLY: uniform even-valued 8×8 blocks
round-trip the DCT/quantization exactly (the proven jpegcodec
contract), gray luma is the identity (the 299/587/114 weights sum to
1000), the 32→8 box resize of 4×4-uniform cells is the cell value, and
the average-hash threshold is integer.  One wrong byte in the encoder,
muxer, demuxer, decoder or hasher flips bits and fails the hash gate.

Scale shape: synthesis/demux/hash is ONE Arrow-batched pass emitting 3
rows of (id, 8-byte hash) per video — pixels never cross a shuffle; the
pair join is hash-sized (equality on the 64-bit hash; swap in
phash_near_dup_pairs' banded join for a hamming radius).  At 100 TB the
videos arrive as binary columns instead of being synthesized; every
stage after the bytes is identical.

Reference: the whole-file scan surface (src/file-utils.c:22-60) is how
the C engine would ingest these; the pipeline past the bytes is
north-star (the reference has no codecs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.operators import similarity as S
from event_streaming_spark.plans.catalog import load, register

_VD_N_DOCS = 120
_VD_GROUPS = 30
_VD_FRAMES = 3


def _cell_expr(k: int, q: int) -> str:
    """Block luma for frame k, grid cell q (0..15) — even, < 256.

    Each cell windows a DIFFERENT bit range of the (non-negative
    32-bit-hash-derived) seed — ``seed % 128`` alone would collapse the
    video space to 128 distinct clips and flood the join with
    structural collisions."""
    return f"2 * (((seed // {1 << ((2 * q) % 16)}) + 17 * {k} + 37 * {q}) % 128)"


def _sql_frame_hash(k: int) -> str:
    """The 64-bit average hash of frame k, predicted arithmetically.

    Resized 8×8 cell (y,x) shows grid block (y//2)*4 + (x//2); bit i
    (row-major cell index) carries weight 2^(63-i) with i=0 the sign
    bit of the signed 64-bit hash; threshold is STRICT > of the integer
    mean (sum of 64 cells div 64 = block sum div 16)."""
    mean = f"(({' + '.join(_cell_expr(k, q) for q in range(16))}) // 16)"
    terms = []
    for i in range(64):
        y, x = divmod(i, 8)
        q = (y // 2) * 4 + (x // 2)
        w = -(1 << 63) if i == 0 else 1 << (63 - i)
        terms.append(f"(CASE WHEN {_cell_expr(k, q)} > {mean} THEN {w} ELSE 0 END)")
    return " + ".join(terms)


_VDED_ORACLE = f"""
WITH hs AS (
  SELECT doc_id, {S.sql_shingle_hashes('text')} AS hs
  FROM documents WHERE doc_id < {_VD_GROUPS}
), reps AS (
  SELECT doc_id AS rep_id, {S.sql_minhash_exprs('hs')[0]}
  FROM hs WHERE len(hs) > 0
), vids AS (
  SELECT d.doc_id, r.mh00 AS seed
  FROM documents d JOIN reps r ON r.rep_id = d.doc_id % {_VD_GROUPS}
  WHERE d.doc_id < {_VD_N_DOCS}
), frames AS (
  {' UNION ALL '.join(
      f"SELECT doc_id, {k} AS frame_idx, cast({{h}} AS BIGINT) AS fh FROM vids"
      .format(h=_sql_frame_hash(k)) for k in range(_VD_FRAMES))}
)
SELECT a.doc_id AS video_a, b.doc_id AS video_b,
       count(DISTINCT a.fh) AS n_shared_frames
FROM frames a JOIN frames b ON a.fh = b.fh AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY video_a, video_b
"""


@register(
    "multimodal_video_frame_dedup",
    _VDED_ORACLE,
    tags=("multimodal", "codec", "dedup", "llm"),
)
def multimodal_video_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize MJPEG AVIs → demux → decode frames → phash → pair
    videos by shared frame hashes; hash-equal to the arithmetic oracle."""
    docs = load(spark, sf_dir, "documents")
    hs = (
        docs.filter(F.col("doc_id") < _VD_GROUPS)
        .select("doc_id", S.shingle_hashes(F.col("text")).alias("hs"))
        .where(F.size("hs") > 0)
    )
    reps = hs.select(
        F.col("doc_id").alias("rep_id"), S.minhash_cols(F.col("hs"))[0]
    ).withColumnRenamed("mh00", "seed")
    vids = (
        docs.filter(F.col("doc_id") < _VD_N_DOCS)
        .select("doc_id", (F.col("doc_id") % _VD_GROUPS).alias("g"))
        .join(F.broadcast(reps), F.col("g") == F.col("rep_id"))
        .select("doc_id", "seed")
    )

    def _hash_frames(batches):
        import numpy as np

        from event_streaming_spark.operators.avidemux import (
            build_mjpeg_avi,
            iter_video_frames,
        )
        from event_streaming_spark.operators.jpegcodec import encode_jpeg
        from event_streaming_spark.operators.phash import average_hash_bytes

        for pdf in batches:
            out: list[tuple[int, int, int]] = []
            for doc_id, seed in zip(pdf["doc_id"], pdf["seed"]):
                doc_id, seed = int(doc_id), int(seed)
                frames = []
                for k in range(_VD_FRAMES):
                    img = np.zeros((32, 32, 3), np.uint8)
                    for q in range(16):
                        by, bx = divmod(q, 4)
                        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = 2 * (
                            ((seed >> ((2 * q) % 16)) + 17 * k + 37 * q) % 128
                        )
                    frames.append(encode_jpeg(img, subsampling="444"))
                video = build_mjpeg_avi(frames, 32, 32)
                # the real ingest path: RIFF demux -> per-frame JPEG bytes
                # -> decode -> 64-bit average hash
                for idx, off, size in iter_video_frames(video):
                    fh = average_hash_bytes(video[off : off + size])
                    out.append((doc_id, idx, fh))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "fh"])

    frames = vids.mapInPandas(_hash_frames, "doc_id long, frame_idx int, fh long")
    a = frames.select(F.col("doc_id").alias("video_a"), F.col("fh").alias("ha"))
    b = frames.select(F.col("doc_id").alias("video_b"), F.col("fh").alias("hb"))
    return (
        a.join(b, (F.col("ha") == F.col("hb")) & (F.col("video_a") < F.col("video_b")))
        .groupBy("video_a", "video_b")
        .agg(F.countDistinct("ha").alias("n_shared_frames"))
        .orderBy("video_a", "video_b")
    )


# ---------------------------------------------------------------------------
# Video scene segmentation: cut detection on consecutive-frame hash
# distance + gaps-and-islands scene assembly.
# ---------------------------------------------------------------------------

_VS_N_DOCS = 120
_VS_GROUPS = 30
_VS_FRAMES = 12
_VS_THRESH = 8  # hamming cut threshold (same-scene frames are identical)


def _vs_cell(q: int) -> str:
    """Block luma for grid cell q under a SCENE-dependent shift.

    The 29·scene·(q+1) term shifts each cell DIFFERENTLY per scene — a
    uniform shift would move the mean with the cells and leave the
    average hash unchanged (the threshold is relative)."""
    return (
        f"2 * (((seed // {1 << ((2 * q) % 16)})"
        f" + 29 * scene * {q + 1} + 37 * {q}) % 128)"
    )


def _vs_oracle() -> str:
    cells = ", ".join(f"{_vs_cell(q)} AS c{q}" for q in range(16))
    cell_sum = " + ".join(f"c{q}" for q in range(16))
    signs = ", ".join(
        f"(CASE WHEN c{q} > m THEN 1 ELSE 0 END) AS s{q}" for q in range(16)
    )
    diff = " + ".join(
        f"(CASE WHEN a.s{q} <> b.s{q} THEN 1 ELSE 0 END)" for q in range(16)
    )
    return f"""
WITH hs AS (
  SELECT doc_id, {S.sql_shingle_hashes('text')} AS hs
  FROM documents WHERE doc_id < {_VS_GROUPS}
), reps AS (
  SELECT doc_id AS rep_id, {S.sql_minhash_exprs('hs')[0]}
  FROM hs WHERE len(hs) > 0
), vids AS (
  SELECT d.doc_id, r.mh00 AS seed
  FROM documents d JOIN reps r ON r.rep_id = d.doc_id % {_VS_GROUPS}
  WHERE d.doc_id < {_VS_N_DOCS}
), fr AS MATERIALIZED (
  SELECT doc_id, cast(range AS INTEGER) AS k, seed,
         cast(bit_count(cast(seed AS BIGINT)
                   & ((1::BIGINT << (cast(range AS INTEGER) + 1)) - 2))
              AS BIGINT) AS scene
  FROM vids, range({_VS_FRAMES})
), c AS (
  SELECT doc_id, k, {cells}, ({cell_sum}) // 16 AS m
  FROM fr
), sg AS MATERIALIZED (
  SELECT doc_id, k, {signs} FROM c
), d AS (
  SELECT a.doc_id, a.k,
         CASE WHEN a.k = 0 THEN 0
              WHEN 4 * ({diff}) > {_VS_THRESH} THEN 1 ELSE 0 END AS cut
  FROM sg a LEFT JOIN sg b ON b.doc_id = a.doc_id AND b.k = a.k - 1
), seg AS MATERIALIZED (
  SELECT doc_id, k, cut,
         sum(cut) OVER (PARTITION BY doc_id ORDER BY k
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS scene_id
  FROM d
), lens AS (
  SELECT doc_id, scene_id, cast(count(*) AS BIGINT) AS len
  FROM seg GROUP BY doc_id, scene_id
), agg1 AS (
  SELECT doc_id, cast(count(*) AS BIGINT) AS n_frames,
         cast(max(scene_id) + 1 AS BIGINT) AS n_scenes,
         cast(coalesce(min(CASE WHEN cut = 1 THEN k END), -1) AS BIGINT)
           AS first_cut_idx
  FROM seg GROUP BY doc_id
), agg2 AS (
  SELECT doc_id, cast(max(len) AS BIGINT) AS longest_scene_frames
  FROM lens GROUP BY doc_id
)
SELECT a.doc_id AS video_id, a.n_frames, a.n_scenes,
       b.longest_scene_frames, a.first_cut_idx
FROM agg1 a JOIN agg2 b USING (doc_id)
ORDER BY video_id
"""


@register(
    "multimodal_video_scene_segments",
    _vs_oracle(),
    tags=("multimodal", "codec", "llm"),
)
def multimodal_video_scene_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut segmentation: demux+decode frames, hash, cut on hamming
    distance between consecutive frames, assemble scenes as islands.

    The standard shot-boundary pipeline (frame feature distance over a
    threshold → cut; PySceneDetect's content detector shape), run over
    REAL MJPEG videos synthesized with the in-repo codec: scene
    structure is planted via seed bits (frame k's scene = popcount of
    seed bits 1..k), frames within a scene are pixel-identical, and
    the oracle predicts every decoded block arithmetically under the
    proven jpegcodec round-trip contract — one wrong byte anywhere in
    the encode→mux→demux→decode→hash→segment chain flips the gate.

    Scale shape: synthesis/demux/hash is ONE Arrow-batched pass
    emitting _VS_FRAMES skinny rows per video (pixels never cross a
    shuffle); segmentation is a per-video ordered window over
    frame-count-sized rows — at 100 TB the videos arrive as binary
    columns and every stage after the bytes is identical.

    Reference: whole-file ingest surface (src/file-utils.c:22-60);
    the pipeline past the bytes is north-star (no codecs in the C
    engine).
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    hs = (
        docs.filter(F.col("doc_id") < _VS_GROUPS)
        .select("doc_id", S.shingle_hashes(F.col("text")).alias("hs"))
        .where(F.size("hs") > 0)
    )
    reps = hs.select(
        F.col("doc_id").alias("rep_id"), S.minhash_cols(F.col("hs"))[0]
    ).withColumnRenamed("mh00", "seed")
    vids = (
        docs.filter(F.col("doc_id") < _VS_N_DOCS)
        .select("doc_id", (F.col("doc_id") % _VS_GROUPS).alias("g"))
        .join(F.broadcast(reps), F.col("g") == F.col("rep_id"))
        .select("doc_id", "seed")
    )

    def _hash_frames(batches):
        import numpy as np

        from event_streaming_spark.operators.avidemux import (
            build_mjpeg_avi,
            iter_video_frames,
        )
        from event_streaming_spark.operators.jpegcodec import encode_jpeg
        from event_streaming_spark.operators.phash import average_hash_bytes

        for pdf in batches:
            out: list[tuple[int, int, int]] = []
            for doc_id, seed in zip(pdf["doc_id"], pdf["seed"]):
                doc_id, seed = int(doc_id), int(seed)
                frames = []
                for k in range(_VS_FRAMES):
                    scene = (seed & ((1 << (k + 1)) - 2)).bit_count()
                    img = np.zeros((32, 32, 3), np.uint8)
                    for q in range(16):
                        by, bx = divmod(q, 4)
                        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = 2 * (
                            ((seed >> ((2 * q) % 16))
                             + 29 * scene * (q + 1) + 37 * q) % 128
                        )
                    frames.append(encode_jpeg(img, subsampling="444"))
                video = build_mjpeg_avi(frames, 32, 32)
                for idx, off, size in iter_video_frames(video):
                    fh = average_hash_bytes(video[off : off + size])
                    out.append((doc_id, idx, fh))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "fh"])

    from event_streaming_spark.operators.materialize import materialize

    frames = vids.mapInPandas(_hash_frames, "doc_id long, frame_idx int, fh long")
    wd = Window.partitionBy("doc_id").orderBy("frame_idx")
    cut = F.when(F.lag("fh").over(wd).isNull(), 0).when(
        F.bit_count(F.col("fh").bitwiseXOR(F.lag("fh").over(wd))) > _VS_THRESH, 1
    ).otherwise(0)
    # seg feeds TWO consumers (scene lengths + per-video rollup) — pin the
    # frame-count-sized frame once or the codec pass (encode→mux→demux→
    # decode→hash, the expensive stage) re-runs per consumer.
    seg = materialize(
        frames.select("doc_id", "frame_idx", cut.alias("cut")).withColumn(
            "scene_id",
            F.sum("cut").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
        ),
        "video-scene-seg",
    )
    lens = seg.groupBy("doc_id", "scene_id").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    agg1 = seg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        (F.max("scene_id") + 1).cast("long").alias("n_scenes"),
        F.coalesce(
            F.min(F.when(F.col("cut") == 1, F.col("frame_idx"))), F.lit(-1)
        )
        .cast("long")
        .alias("first_cut_idx"),
    )
    agg2 = lens.groupBy("doc_id").agg(
        F.max("len").cast("long").alias("longest_scene_frames")
    )
    return (
        agg1.join(agg2, "doc_id")
        .select(
            F.col("doc_id").alias("video_id"),
            "n_frames",
            "n_scenes",
            "longest_scene_frames",
            "first_cut_idx",
        )
        .orderBy("video_id")
    )

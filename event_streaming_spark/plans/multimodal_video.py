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

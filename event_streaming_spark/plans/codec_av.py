"""PNG and G.711-audio codec queries under the differential oracle.

Same contract as ``multimodal_jpeg_decode_stats`` (plans/scale_ops3.py):
the engine SYNTHESIZES deterministic media from table-derived
parameters, pushes it through its own REAL encoder and decoder inside
one Arrow-batched pandas UDF, and DuckDB predicts the decoded statistics
purely arithmetically — possible because PNG is lossless (the decoded
pixel sum IS the generated pattern's sum) and G.711 expansion is an
exact ITU-T closed form a SQL expression can replicate bit-for-bit.

Reference parity: the reference engine has no codecs — this is the
multimodal-column story (SURVEY §2.5) that a training-data pipeline
needs: opaque ``binary`` payloads decoded per-item with zero cross-row
state.

Scale: both queries are embarrassingly parallel — per-row CPU inside
``pandas_udf`` batches, no shuffle before the final ORDER BY; at 100 TB
the decode stage pipelines into the scan.  The PNG path cycles all five
scanline filter types so every defilter branch (incl. the sequential
Sub/Average/Paeth recurrences) is under the hash gate; the audio path
grades the RIFF chunk walk, the µ-law expansion table, and an
integer energy-gate VAD.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# PNG: content-addressed test pattern (size and seed derived from doc_id
# and the document's text length) → encode_png (filters cycling 0-4) →
# decode_png → (width, height, pixel byte sum).  Lossless codec ⇒ the
# oracle computes the same sum straight from the generator formula.
# ---------------------------------------------------------------------------

_PNG_N_DOCS = 200

_PNG_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         4 + (doc_id % 13) AS w,
         4 + ((doc_id // 13) % 11) AS h,
         (doc_id * 97 + length(text)) % 251 AS seed
  FROM documents WHERE doc_id < {_PNG_N_DOCS}
)
SELECT doc_id,
       cast(w AS INT) AS width,
       cast(h AS INT) AS height,
       cast(list_sum(list_transform(generate_series(0, w * h * 3 - 1),
            i -> (seed + 7 * (i // (w * 3)) + 3 * ((i // 3) % w) + 11 * (i % 3)) % 256))
            AS BIGINT) AS px_sum
FROM g
ORDER BY doc_id
"""


@register("multimodal_png_decode_stats", _PNG_ORACLE, tags=("multimodal", "codec"))
def multimodal_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _PNG_N_DOCS)
    g = docs.select(
        "doc_id",
        (F.lit(4) + F.col("doc_id") % 13).cast("int").alias("w"),
        (F.lit(4) + F.expr("(doc_id div 13) % 11")).cast("int").alias("h"),
        ((F.col("doc_id") * 97 + F.length("text")) % 251).cast("int").alias("seed"),
    )

    @pandas_udf("width int, height int, px_sum long")
    def _roundtrip(w: pd.Series, h: pd.Series, seed: pd.Series) -> pd.DataFrame:
        import numpy as np

        from event_streaming_spark.operators.multimodal import decode_png, encode_png

        ws, hs, ss = [], [], []
        for w_, h_, sd in zip(w, h, seed):
            w_, h_, sd = int(w_), int(h_), int(sd)
            y, x, c = np.ogrid[0:h_, 0:w_, 0:3]
            img = ((sd + 7 * y + 3 * x + 11 * c) % 256).astype(np.uint8)
            _fmt, w_px, h_px, px_sum = decode_png(encode_png(img))
            ws.append(w_px)
            hs.append(h_px)
            ss.append(px_sum)
        return pd.DataFrame({"width": ws, "height": hs, "px_sum": ss})

    stats = g.select("doc_id", _roundtrip("w", "h", "seed").alias("s"))
    return stats.select(
        "doc_id",
        F.col("s.width").alias("width"),
        F.col("s.height").alias("height"),
        F.col("s.px_sum").alias("px_sum"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# G.711 µ-law audio: a deterministic byte pattern goes through the RIFF
# container writer, the chunk-walking decoder, and the ITU-T expansion
# table; features are exact integers (Σ|pcm|, max|pcm|, energy-gate VAD
# over 160-sample telephony frames).  DuckDB replicates the µ-law closed
# form with bit operators — the 256-entry table and the SQL expression
# were cross-checked equal for every code byte (tests/test_codec_av.py).
# ---------------------------------------------------------------------------

_AUD_N_DOCS = 300
_AUD_FRAME = 160
_AUD_THRESHOLD = 957000


def _ulaw_abs_sql(idx: str) -> str:
    """|pcm| of payload byte ``(seed + 13*idx) % 256`` — µ-law expansion
    as pure integer SQL (u = complemented code byte)."""
    u = f"(255 - ((seed + 13 * ({idx})) % 256))"
    return (
        f"abs((CASE WHEN ({u} & 128) > 0 THEN -1 ELSE 1 END)"
        f" * (((({u} & 15) * 8 + 132) * (1 << (({u} >> 4) & 7))) - 132))"
    )


_AUD_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         {_AUD_FRAME} * (1 + doc_id % 4) AS n,
         (doc_id * 131 + length(text)) % 256 AS seed
  FROM documents WHERE doc_id < {_AUD_N_DOCS}
)
SELECT doc_id,
       cast(n AS INT) AS n_samples,
       cast(list_sum(list_transform(generate_series(0, n - 1),
            k -> {_ulaw_abs_sql('k')})) AS BIGINT) AS sum_abs,
       cast(list_max(list_transform(generate_series(0, n - 1),
            k -> {_ulaw_abs_sql('k')})) AS INT) AS peak_abs,
       cast(list_sum(list_transform(generate_series(0, n // {_AUD_FRAME} - 1),
            f -> CASE WHEN list_sum(list_transform(generate_series(0, {_AUD_FRAME - 1}),
                          j -> {_ulaw_abs_sql(f'f * {_AUD_FRAME} + j')}))
                          > {_AUD_THRESHOLD} THEN 1 ELSE 0 END)) AS INT) AS n_active_frames
FROM g
ORDER BY doc_id
"""


@register("multimodal_audio_vad_stats", _AUD_ORACLE, tags=("multimodal", "codec", "audio"))
def multimodal_audio_vad_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _AUD_N_DOCS)
    g = docs.select(
        "doc_id",
        (F.lit(_AUD_FRAME) * (F.lit(1) + F.col("doc_id") % 4)).cast("int").alias("n"),
        ((F.col("doc_id") * 131 + F.length("text")) % 256).cast("int").alias("seed"),
    )

    @pandas_udf("n_samples int, sum_abs long, peak_abs int, n_active_frames int")
    def _roundtrip(n: pd.Series, seed: pd.Series) -> pd.DataFrame:
        import numpy as np

        from event_streaming_spark.operators.multimodal import (
            decode_audio_g711_integers,
            encode_wav,
        )

        ns, sa, pk, af = [], [], [], []
        for n_, sd in zip(n, seed):
            n_, sd = int(n_), int(sd)
            payload = ((sd + 13 * np.arange(n_, dtype=np.int64)) % 256).astype(np.uint8)
            wav = encode_wav(payload.tobytes(), audio_fmt=7)
            _sr, n_samples, sum_abs, peak_abs, n_active = decode_audio_g711_integers(
                wav, frame_len=_AUD_FRAME, active_threshold=_AUD_THRESHOLD
            )
            ns.append(n_samples)
            sa.append(sum_abs)
            pk.append(peak_abs)
            af.append(n_active)
        return pd.DataFrame(
            {"n_samples": ns, "sum_abs": sa, "peak_abs": pk, "n_active_frames": af}
        )

    stats = g.select("doc_id", _roundtrip("n", "seed").alias("s"))
    return stats.select(
        "doc_id",
        F.col("s.n_samples").alias("n_samples"),
        F.col("s.sum_abs").alias("sum_abs"),
        F.col("s.peak_abs").alias("peak_abs"),
        F.col("s.n_active_frames").alias("n_active_frames"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Audio fingerprint matching: a shift-invariant energy-peak constellation
# (the Shazam/Wang-2003 landmark shape restricted to the telephony band:
# peaks of the per-frame energy sequence; hash = (peak energy, next peak
# energy, frame gap)).  Clips are planted in residue classes sharing the
# same µ-law byte stream at DIFFERENT start offsets and lengths — the
# constellation hashes survive the shift (the whole point of landmark
# pairs), so re-uploads/clips of the same recording match on an EQUALITY
# join while cross-class collisions are energy-magnitude impossible.
# ---------------------------------------------------------------------------

_AFP_N_DOCS = 240
_AFP_GROUPS = 40
_AFP_FRAME = 160
_AFP_MAX_FRAMES = 18  # nf = 12 + (doc_id % 4) * 2 ∈ {12,14,16,18}

_AFP_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         12 + (doc_id % 4) * 2 AS nf,
         doc_id % 3 AS off,
         ((doc_id % {_AFP_GROUPS}) * 131 + 17) % 256 AS seed,
         2 * (doc_id % {_AFP_GROUPS}) + 13 AS mult
  FROM documents WHERE doc_id < {_AFP_N_DOCS}
), fe AS MATERIALIZED (
  SELECT doc_id, cast(t.f AS INTEGER) AS f,
         cast(list_sum(list_transform(generate_series(0, {_AFP_FRAME - 1}),
              j -> {{abs_expr}})) AS BIGINT) AS e
  FROM g, range({_AFP_MAX_FRAMES}) t(f) WHERE t.f < nf
), pk AS (
  SELECT doc_id, f, e,
         CASE WHEN e > lag(e) OVER w AND e > lead(e) OVER w
              THEN 1 ELSE 0 END AS ispk
  FROM fe WINDOW w AS (PARTITION BY doc_id ORDER BY f)
), hashes AS MATERIALIZED (
  SELECT doc_id, e1, e2, dt FROM (
    SELECT doc_id, e AS e1,
           lead(e) OVER wp AS e2,
           lead(f) OVER wp - f AS dt
    FROM pk WHERE ispk = 1
    WINDOW wp AS (PARTITION BY doc_id ORDER BY f)
  ) WHERE e2 IS NOT NULL
)
SELECT a.doc_id AS clip_a, b.doc_id AS clip_b,
       cast(count(*) AS BIGINT) AS n_shared
FROM hashes a
JOIN hashes b ON a.e1 = b.e1 AND a.e2 = b.e2 AND a.dt = b.dt
            AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY clip_a, clip_b
""".format(abs_expr=_ulaw_abs_sql(f"mult * ((t.f + off) * {_AFP_FRAME} + j)"))


@register(
    "multimodal_audio_fingerprint_match",
    _AFP_ORACLE,
    tags=("multimodal", "codec", "audio", "dedup"),
)
def multimodal_audio_fingerprint_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-pair audio fingerprinting over REAL G.711 WAV clips.

    Every clip goes through the actual container round-trip (µ-law
    payload → RIFF writer → chunk-walking decoder → expansion table →
    per-frame Σ|pcm|); fingerprints are (peak, next-peak, gap) triples
    of the energy sequence, invariant to the planted per-clip start
    offsets — one wrong byte in the writer, walker, or table flips the
    hash gate (the oracle predicts every energy via the µ-law closed
    form).

    Scale shape: the codec pass is ONE Arrow-batched pandas_udf
    emitting nf skinny frame rows per clip (samples never cross a
    shuffle); peaks/pairs are per-clip windows over frame-count rows;
    the match is an equi-join on the 3-part hash — the standard
    inverted-index shape, never all-pairs.  At 100 TB clips arrive as
    binary columns and every stage after the bytes is identical.

    Reference: whole-file ingest surface (src/file-utils.c:22-60); the
    pipeline past the bytes is north-star (no codecs in the C engine).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _AFP_N_DOCS)
    g = docs.select(
        "doc_id",
        (F.lit(12) + (F.col("doc_id") % 4) * 2).cast("int").alias("nf"),
        (F.col("doc_id") % 3).cast("int").alias("off"),
        (((F.col("doc_id") % _AFP_GROUPS) * 131 + 17) % 256).cast("int").alias("seed"),
        # per-class odd multiplier: classes are DIFFERENT byte streams,
        # not phase shifts of one cyclic stream (13·mult stays odd, so
        # each class walks its own permutation of Z₂₅₆)
        (2 * (F.col("doc_id") % _AFP_GROUPS) + 13).cast("int").alias("mult"),
    )

    @pandas_udf("array<long>")
    def _energies(
        nf: pd.Series, off: pd.Series, seed: pd.Series, mult: pd.Series
    ) -> pd.Series:
        import numpy as np

        from event_streaming_spark.operators.multimodal import (
            decode_audio_frame_energies,
            encode_wav,
        )

        out = []
        for nf_, off_, sd, mu in zip(nf, off, seed, mult):
            nf_, off_, sd, mu = int(nf_), int(off_), int(sd), int(mu)
            n = nf_ * _AFP_FRAME
            idx = off_ * _AFP_FRAME + np.arange(n, dtype=np.int64)
            payload = ((sd + 13 * mu * idx) % 256).astype(np.uint8)
            wav = encode_wav(payload.tobytes(), audio_fmt=7)
            out.append(decode_audio_frame_energies(wav, _AFP_FRAME).tolist())
        return pd.Series(out)

    fe = g.select(
        "doc_id",
        F.posexplode(_energies("nf", "off", "seed", "mult")).alias("f", "e"),
    )
    w = Window.partitionBy("doc_id").orderBy("f")
    pk = fe.select(
        "doc_id",
        "f",
        "e",
        F.when(
            (F.col("e") > F.lag("e").over(w)) & (F.col("e") > F.lead("e").over(w)),
            1,
        )
        .otherwise(0)
        .alias("ispk"),
    )
    hashes = (
        pk.where(F.col("ispk") == 1)
        .select(
            "doc_id",
            F.col("e").alias("e1"),
            F.lead("e").over(w).alias("e2"),
            (F.lead("f").over(w) - F.col("f")).alias("dt"),
        )
        .where(F.col("e2").isNotNull())
    )
    a = hashes.select(
        F.col("doc_id").alias("clip_a"), "e1", "e2", "dt"
    )
    b = hashes.select(
        F.col("doc_id").alias("clip_b"),
        F.col("e1").alias("f1"),
        F.col("e2").alias("f2"),
        F.col("dt").alias("fdt"),
    )
    return (
        a.join(
            b,
            (F.col("e1") == F.col("f1"))
            & (F.col("e2") == F.col("f2"))
            & (F.col("dt") == F.col("fdt"))
            & (F.col("clip_a") < F.col("clip_b")),
        )
        .groupBy("clip_a", "clip_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .orderBy("clip_a", "clip_b")
    )

"""Compressibility as a corpus-quality signal.

The classic crawl-filter heuristic (CCNet/Gopher-style rule sets):
highly repetitive boilerplate compresses far below normal prose;
random/binary junk barely compresses at all — both tails are filter
candidates.  Lives outside operators/text.py because that module's
charter is pure JVM column expressions; this is deliberately a Python
kernel (zlib), Arrow-batched like the multimodal decode kernels — one
pass, ~2 bytes out per input KB, embarrassingly parallel, no shuffle.

Deterministic for a fixed zlib level, so any run/partitioning/engine
with the same zlib reproduces the score bit-for-bit.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def with_compression_ratio(
    df: DataFrame, text_col: str, out_col: str = "zlib_permille", level: int = 6
) -> DataFrame:
    """Add zlib compressibility in permille:
    ``len(compress(utf8)) * 1000 // len(utf8)`` (NULL for empty/NULL)."""

    @pandas_udf("long")
    def _ratio(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) * 1000 // len(raw)

        return s.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))

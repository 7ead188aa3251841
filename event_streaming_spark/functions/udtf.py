"""Python UDTF examples (SURVEY §2.4 'UDF/UDAF/UDTF' row).

A table function that expands one event row into its session-relative
sub-intervals — the kind of row-expanding logic a UDTF expresses more
naturally than explode chains.  Arrow-optimized where the runtime
supports it.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="part INT, start_ms BIGINT, end_ms BIGINT")
class SplitInterval:
    """Split [start_ms, end_ms) into `n` equal sub-intervals."""

    def eval(self, start_ms: int, end_ms: int, n: int):  # noqa: D102
        if start_ms is None or end_ms is None or not n or end_ms <= start_ms:
            return
        width = (end_ms - start_ms) / n
        for i in range(n):
            s = int(start_ms + i * width)
            e = int(start_ms + (i + 1) * width) if i < n - 1 else end_ms
            yield i, s, e

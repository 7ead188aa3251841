"""Per-key token-bucket rate limiting — batch twin + streaming operator.

The admission recurrence (tokens refill with elapsed event-time, each
admitted event consumes one token) is inherently sequential per key, so
this is one of the few legitimate Pandas-UDF hot paths in the repo (the
same justification as the auth-boundary UDF, functions/auth.py): the
per-key fold cannot be expressed as a window/agg without a recursive
self-reference.  Everything is INTEGER math (µtoken units, µs clocks) so
batch, streaming, replay, and the DuckDB recursive-CTE oracle agree
bit-for-bit.

Scale: grouped-map shuffles once on the key (high-cardinality user
keys); per-group work is a linear numpy/python fold.  The streaming
variant keeps (last_us, tokens) per key in GroupState — O(keys) state,
horizontally partitioned like keep_latest_stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MICRO = 1_000_000  # 1 token in µtokens; 1 second in µs


def _fold(
    ts_us: list[int],
    start_us: int | None,
    start_tokens: int,
    cap_scaled: int,
    refill_den_us: int,
) -> tuple[list[bool], int, int]:
    """The shared admission recurrence: returns (admitted flags,
    final_last_us, final_tokens_scaled).  ``refill_den_us`` = µs per
    token (e.g. 7_200 * MICRO for 1 token / 2 h ... in µtokens/µs terms
    refill = elapsed_us * MICRO // refill_den_us)."""
    admitted: list[bool] = []
    last_us, tokens = start_us, start_tokens
    for us in ts_us:
        if last_us is not None:
            elapsed = max(us - last_us, 0)
            tokens = min(cap_scaled, tokens + elapsed * MICRO // refill_den_us)
        ok = tokens >= MICRO
        if ok:
            tokens -= MICRO
        admitted.append(ok)
        last_us = us
    return admitted, (last_us if last_us is not None else 0), tokens


def token_bucket_batch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    rate_seconds_per_token: int = 7200,
    capacity_tokens: int = 3,
) -> DataFrame:
    """Batch admission audit: every event + an ``admitted`` flag.

    Each key starts with a FULL bucket; events are processed in
    (ts, seq) order.  Deterministic: integer µtoken arithmetic and a
    total per-key order."""
    cap_scaled = capacity_tokens * MICRO
    den_us = rate_seconds_per_token * MICRO
    out_schema = T.StructType(
        list(events.schema) + [T.StructField("admitted", T.BooleanType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, seq_col], kind="stable").reset_index(drop=True)
        ts_us = [int(pd.Timestamp(t).value // 1000) for t in pdf[ts_col]]
        flags, _, _ = _fold(ts_us, None, cap_scaled, cap_scaled, den_us)
        pdf["admitted"] = flags
        return pdf

    return events.groupBy(key_col).applyInPandas(fn, out_schema)


def token_bucket_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    rate_seconds_per_token: int = 7200,
    capacity_tokens: int = 3,
    payload_cols: tuple[str, ...] = ("event_type", "value"),
) -> DataFrame:
    """Streaming admission: same recurrence with (last_us, tokens) in
    GroupState, so a drained stream converges to the batch twin when
    events arrive in event-time order per key (the test asserts it)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cap_scaled = capacity_tokens * MICRO
    den_us = rate_seconds_per_token * MICRO
    out_schema = T.StructType(
        [
            T.StructField(key_col, events.schema[key_col].dataType),
            T.StructField(seq_col, events.schema[seq_col].dataType),
            events.schema[ts_col],
        ]
        + [events.schema[c] for c in payload_cols]
        + [T.StructField("admitted", T.BooleanType())]
    )
    state_schema = T.StructType(
        [T.StructField("last_us", T.LongType()), T.StructField("tokens", T.LongType())]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_us, tokens = (state.get if state.exists else (None, cap_scaled))
        if last_us == 0 and not state.exists:
            last_us = None
        rows = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values([ts_col, seq_col], kind="stable")
            ts_us = [int(pd.Timestamp(t).value // 1000) for t in pdf[ts_col]]
            flags, last_us, tokens = _fold(ts_us, last_us, tokens, cap_scaled, den_us)
            for (_, r), ok in zip(pdf.iterrows(), flags):
                rows.append(
                    [r[key_col], r[seq_col], r[ts_col]]
                    + [r[c] for c in payload_cols]
                    + [ok]
                )
        state.update((last_us if last_us is not None else 0, tokens))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[key_col, seq_col, ts_col, *payload_cols, "admitted"],
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def admission_summary(audited: DataFrame) -> DataFrame:
    """Per-event-type admit/reject counts from a token_bucket_batch run."""
    return audited.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("admitted").cast("long")).alias("n_admitted"),
        F.sum((~F.col("admitted")).cast("long")).alias("n_rejected"),
    )

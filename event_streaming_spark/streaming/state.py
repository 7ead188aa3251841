"""Stateful streaming operators: keep-latest upsert + stream dedup.

Reference parity:
  - O4/O27 keep-latest-upsert semantics (subscribe replace-latest,
    header-map unconditional replace): /root/reference/src/
    events-agency.c:207-219, utils/email-sender.c:208-212.
  - O23 discard-duplicate policy under streaming → dropDuplicates /
    dropDuplicatesWithinWatermark.

Spark-first: `applyInPandasWithState` keeps one row per key (max event
time wins; ties broken by a sequence column).  Emits the current latest
per key each micro-batch ("update"-style over an append sink via
foreachBatch).  State is per-key-group on executors — scales horizontally;
at 100 TB of throughput the bottleneck is the state store, so keys must
be high-cardinality (they are: user/topic keys), not a global singleton.

Batch twins of these semantics live in operators/dedup.py and are
oracle-checked; the streaming tests assert stream==batch convergence.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def keep_latest_stream(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "ts",
    payload_cols: tuple[str, ...] = ("event_id", "event_type", "value"),
    seq_col: str = "event_id",
) -> DataFrame:
    """Streaming keep-latest: one output row per key per micro-batch with
    the latest payload so far (across batches, via GroupState).

    Ties on ``order_col`` are broken by ``seq_col`` (a unique sequence
    id), in the per-batch sort AND the cross-batch state comparison — so
    replay after failure re-elects the SAME winner regardless of arrival
    order (the deterministic-replay contract in operators/dedup.py).
    Matches the batch twin ``dedup_keep_latest(keys, [order, seq])``.
    """

    out_fields = [events.schema[key_col], events.schema[order_col]] + [
        events.schema[c] for c in payload_cols
    ]
    out_schema = T.StructType(out_fields)
    # state = latest (order_col as epoch-us, seq tie-break) + payload values
    state_schema = T.StructType(
        [T.StructField("ord_us", T.LongType()), T.StructField("seq", T.LongType())]
        + [events.schema[c] for c in payload_cols]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            best, best_payload = (st[0], st[1]), list(st[2:])
        else:
            best, best_payload = (-(2**62), -(2**62)), None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values([order_col, seq_col], kind="stable")
            last = pdf.iloc[-1]
            cand = (int(pd.Timestamp(last[order_col]).value // 1000), int(last[seq_col]))
            if cand > best:
                best = cand
                best_payload = [last[c] for c in payload_cols]
        if best_payload is not None:
            state.update((best[0], best[1], *best_payload))
            row = {
                key_col: key[0],
                order_col: pd.Timestamp(best[0] * 1000),
                **{c: v for c, v in zip(payload_cols, best_payload)},
            }
            yield pd.DataFrame([row])

    return events.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-wins streaming dedup with bounded state (O23 discard policy):
    duplicates arriving within the watermark horizon are dropped; state
    for old keys is evicted once the watermark passes."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)

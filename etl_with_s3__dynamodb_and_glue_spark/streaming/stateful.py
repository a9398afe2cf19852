"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the Spark-native escape hatch for operators
the built-ins can't express — SURVEY.md §7 phase 4 pattern).

Semantics match ``operators.sessions.sessionize`` exactly; on a single
AvailableNow batch the outputs are identical (asserted in tests). In
continuous mode, a session that spans micro-batches is carried in the
group state (last event time + running aggregates) and re-emitted with
updated totals each batch ("update" semantics, mirroring the
reference's overwrite-by-key sink contract); the state times out
after ``gap`` of processing-time silence.

Scale: state is one small dict per active user — bounded by the live
user population, not event volume; Arrow-batched transfer, no
per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sessions import DEFAULT_GAP_SECONDS

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.IntegerType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.IntegerType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _fold_sessions(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    if state.hasTimedOut:
        # A full gap of processing-time silence elapsed: the stored
        # session is final. Emit it once more (final totals win under
        # the overwrite-by-key sink contract), FREE the state, and do
        # not re-arm the timer — otherwise state grows with every user
        # ever seen and idle users re-emit forever.
        seq, start_us, end_us, n_events, total_value = state.get
        state.remove()
        yield pd.DataFrame(
            [
                (
                    user_id,
                    seq,
                    pd.Timestamp(start_us, unit="us"),
                    pd.Timestamp(end_us, unit="us"),
                    n_events,
                    round(total_value, 6),
                )
            ],
            columns=[f.name for f in OUTPUT_SCHEMA.fields],
        )
        return
    if state.exists:
        seq, start_us, end_us, n_events, total_value = state.get
    else:
        seq, start_us, end_us, n_events, total_value = 0, None, None, 0, 0.0

    out: list[tuple] = []

    def emit() -> None:
        out.append(
            (
                user_id,
                seq,
                pd.Timestamp(start_us, unit="us"),
                pd.Timestamp(end_us, unit="us"),
                n_events,
                round(total_value, 6),
            )
        )

    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
        for t, v in zip(ts_us.tolist(), pdf["value"].tolist()):
            if start_us is None or t - end_us > gap_us:
                if start_us is not None:
                    emit()
                seq += 1
                start_us, end_us, n_events, total_value = t, t, 1, float(v)
            else:
                end_us = t
                n_events += 1
                total_value += float(v)
    if start_us is not None:
        emit()  # open session: emitted with current totals (update semantics)
        state.update((seq, start_us, end_us, n_events, total_value))
        state.setTimeoutDuration(gap_us // 1000)
    yield pd.DataFrame(
        out,
        columns=[f.name for f in OUTPUT_SCHEMA.fields],
    )


def sessionize_stream(
    events: DataFrame, gap_seconds: int = DEFAULT_GAP_SECONDS
) -> DataFrame:
    """Streaming sessionization over an events stream with columns
    (user_id, ts, event_id, value)."""
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state):
        return _fold_sessions(key, pdf_iter, state, gap_us)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

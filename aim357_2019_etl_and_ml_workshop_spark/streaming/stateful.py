"""Custom stateful streaming operators (SURVEY.md §2.9 extension:
'applyInPandasWithState for custom stateful operators').

The reference's only state across runs is the Glue job bookmark
(etl-cfn-2am-trigger.json:264-290 nightly rerun); these operators carry
PER-KEY state across micro-batches inside one streaming query — the Spark-
native generalization. State lives in the state store (checkpointed,
fault-tolerant); each operator is an Arrow-batched pandas function over a
key group, so the scale shape is groupBy-key shuffle + per-key state rows,
never a global collect.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counts(
    stream: DataFrame,
    key_col: str,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Per-key RUNNING event count maintained in GroupState across
    micro-batches. Output mode 'update': one (key, total) row per key per
    batch in which the key appeared."""

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "total": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=f"{key_col} string, total long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=timeout,
    )


def running_stats(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Per-key running (count, sum, min, max) over a numeric column —
    the incremental-aggregate pattern for dashboards/alerting where a
    windowed aggregate would forget history. State is four scalars per key;
    merge is associative so late re-partitioning cannot corrupt it."""

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, mn, mx = state.get
        else:
            n, s, mn, mx = 0, 0.0, None, None
        for pdf in pdfs:
            v = pdf[value_col]
            if len(v):
                n += len(v)
                s += float(v.sum())
                bmn, bmx = float(v.min()), float(v.max())
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
        state.update((n, s, mn, mx))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "total": [s],
                "v_min": [mn],
                "v_max": [mx],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=(
            f"{key_col} string, n long, total double, "
            "v_min double, v_max double"
        ),
        stateStructType="n long, total double, v_min double, v_max double",
        outputMode="update",
        timeoutConf=timeout,
    )


def sessionize_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Stateful streaming sessionization: per-key events are grouped into
    sessions separated by silences longer than ``gap_seconds``; a CLOSED
    session row (key, session_start, session_end, n_events) is emitted as
    soon as a later event proves the gap. The open tail session lives in
    GroupState as three scalars (start, last, count) — state is O(keys),
    not O(events), and survives micro-batch boundaries/restarts via the
    checkpoint. The batch twin is sessionize (queries.py) — same gap rule
    over a static frame."""

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed: list[tuple] = []
        ts_all: list[float] = []
        for pdf in pdfs:
            ts_all.extend(
                t.timestamp() for t in pd.to_datetime(pdf[ts_col])
            )
        for t in sorted(ts_all):
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_seconds:
                closed.append((key[0], start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [c[0] for c in closed],
                    "session_start": [
                        pd.Timestamp(c[1], unit="s") for c in closed
                    ],
                    "session_end": [
                        pd.Timestamp(c[2], unit="s") for c in closed
                    ],
                    "n_events": [c[3] for c in closed],
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=(
            f"{key_col} string, session_start timestamp, "
            "session_end timestamp, n_events long"
        ),
        stateStructType="start double, last double, n long",
        outputMode="append",
        timeoutConf=timeout,
    )

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

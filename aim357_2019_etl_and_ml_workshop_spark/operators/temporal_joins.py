"""Temporal join operators Spark lacks natively (as-of join, range join) —
built as compositions of DataFrame ops per the Spark-first rule: express as
equi-join + window/filter so Catalyst still picks the physical strategy
(no mapPartitions, no cross join).

- ``asof_join``: for each left row, the latest right row with
  right.ts <= left.ts within the same key — the point-in-time join used for
  feature lookup (orders vs latest price, event vs latest model version).
  Implementation: union both sides tagged, one window pass per key ordered
  by (ts, side) with last(right_value, ignorenulls) carry-forward. One
  shuffle on the key, no range explosion. Backward direction only (the
  common case); tolerance via post-filter.

- ``range_join``: left.ts ∈ [right.start, right.end) against an UNKEYED
  interval table. Implementation: bucketize both sides to a grid
  (interval rows explode to the buckets they overlap), equi-join on bucket,
  then exact bounds filter — the standard bucketed-range-join; shuffle is
  on bucket keys, candidate pairs are only same-bucket."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + the value columns of the most recent
    right row (right_ts <= left_ts) per key; NULLs when none precedes."""
    lt = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (key, left_ts)
        ],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    unioned = lt.unionByName(rt)
    # right rows sort BEFORE left rows at equal ts (_is_left 0 < 1), so a
    # right row at exactly left_ts is visible to that left row (<=).
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_cf_{c}")
            for c in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_cf_ts"),
    )
    out = carried.where(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("_ts").cast("double") - F.col("_cf_ts").cast("double")
        ) <= tolerance_seconds
        out = out.select(
            "*",
            *[
                F.when(within, F.col(f"_cf_{c}")).alias(f"_tol_{c}")
                for c in value_cols
            ],
        )
        keep = [F.col(f"_tol_{c}").alias(f"r_{c}") for c in value_cols]
    else:
        keep = [F.col(f"_cf_{c}").alias(f"r_{c}") for c in value_cols]
    left_keep = [c for c in left.columns if c not in (key, left_ts)]
    return out.select(
        F.col(key),
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in left_keep],
        *keep,
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Unkeyed interval join: each point row matched to every interval with
    start <= point_ts < end. Intervals explode to their overlapped buckets
    (intervals are few and short relative to the data — the fact side gets
    ONE bucket per row, no explosion).

    ``how`` supports 'inner' and 'left' (left = preserve unmatched points;
    each point carries exactly one bucket, so null-extension is per point
    row). 'right'/'full' are rejected: the interval side is replicated per
    bucket, so unmatched intervals would be emitted once per replica."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join supports how='inner'|'left', got {how!r} "
            "(interval side is bucket-replicated; outer-preserving it would "
            "duplicate unmatched intervals)"
        )
    p = points.withColumn(
        "_bucket",
        (F.col(point_ts).cast("bigint") / bucket_seconds).cast("bigint"),
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_col).cast("bigint") / bucket_seconds).cast("bigint"),
                # end is exclusive; a zero-length interval still gets its bucket
                F.greatest(
                    ((F.col(end_col).cast("bigint") - 1) / bucket_seconds).cast(
                        "bigint"
                    ),
                    (F.col(start_col).cast("bigint") / bucket_seconds).cast("bigint"),
                ),
            )
        ),
    )
    # bounds folded INTO the join condition (not a post-join .where) so a
    # left join preserves unmatched points instead of filtering their null
    # interval columns back out
    cond = (
        (p["_bucket"] == iv["_bucket"])
        & (p[point_ts] >= iv[start_col])
        & (p[point_ts] < iv[end_col])
    )
    joined = p.join(iv, cond, how).drop(iv["_bucket"]).drop(p["_bucket"])
    return joined


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse an event
    stream into one row per (key, consecutive-state run) with
    ``valid_from`` / ``valid_to`` (NULL = current). Gaps-and-islands via
    per-key windows: a run starts where the state differs from its
    predecessor; runs are numbered with a running sum, aggregated to their
    first timestamp, and closed by the next run's start (lead).

    All windows are partitioned by the key — scales with the per-key event
    count, never a global sort. ``tiebreak_col`` makes same-timestamp
    ordering deterministic."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(state_col)).over(w)
    marked = df.select(
        key_col,
        ts_col,
        state_col,
        *([tiebreak_col] if tiebreak_col else []),
        F.when(prev.isNull() | (prev != F.col(state_col)), 1)
        .otherwise(0)
        .alias("_new_run"),
    )
    runs = marked.withColumn(
        "_run",
        F.sum("_new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    collapsed = runs.groupBy(key_col, "_run", state_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    return collapsed.select(
        key_col,
        state_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )

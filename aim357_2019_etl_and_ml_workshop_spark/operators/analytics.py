"""Distributed analytic ranks over LOW-CARDINALITY partition keys.

A window ``PARTITION BY status ORDER BY price`` compiles to one task per
distinct status value — with 3 statuses, the whole table sorts in 3 tasks
no matter how many executors exist, and at 100 TB each task holds tens of
terabytes. That is the canonical window-function scale-killer (global sort
has the same issue and Spark solves it with range partitioning + offsets;
window functions get no such treatment).

``distributed_rank_stats`` computes percent_rank / cume_dist (and
optionally dense_rank on a second ordering) with the same range-partition
two-pass shape Spark's own global sort uses:

1. ``repartitionByRange(width, part, *order)`` — sampled range exchange,
   evenly-sized splits regardless of partition-key cardinality.
2. local ``row_number`` within (range-split, part) — each task sorts only
   its slice.
3. per-(split, part) row counts -> cumulative offsets on a tiny
   #splits x #parts frame -> broadcast back; global rank = offset + local.
4. ratios from the broadcast per-part totals:
   percent_rank = (rank-1)/(n-1), cume_dist = rank/n.

Contract: ``order_cols`` must be a TOTAL order (tie-free — e.g. ending in
a unique key). Under a total order rank() == row_number() and cume_dist's
"rows <= current" is exactly rank/n, so the result is bit-identical to the
single-task window (oracle-verified by rank_distribution_probe). With
ties the built-in semantics (shared rank, group-end cume_dist) would
diverge — callers with tied orderings must append a tiebreaker column.

``dense_col`` ordering may freely contain ties: dense_rank depends only on
the distinct-value order, which is computed on a distinct (part, value)
frame (tiny by the low-cardinality premise) and broadcast-joined back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rs_pid"
_RN = "__rs_rn"
_OFF = "__rs_off"
_N = "__rs_n"
_DR = "__rs_dr"


def distributed_rank_stats(
    df: DataFrame,
    part_col: str,
    order_cols: list[str | Column],
    pr_name: str = "pr",
    cd_name: str = "cd",
    dense_col: str | None = None,
    dense_name: str = "dr",
    width: int | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """percent_rank/cume_dist over ``part_col`` ordered by the TOTAL order
    ``order_cols``, plus optional dense_rank over ``dense_col`` — all
    computed with even range splits instead of one task per part value.
    Returns the input columns plus the three analytic columns.

    Storage/fault-tolerance cost (ADVICE r05): the eager localCheckpoint
    below materializes the FULL input on executor-local storage and
    truncates lineage — one disk-resident copy of the table for the
    query's lifetime, and a lost executor mid-query fails the job instead
    of recomputing (local checkpoints are not replicated). That is the
    price of a correct shared pid assignment; deriving split ids from
    collected range boundaries instead would avoid the materialization
    but re-sorts the input TWICE (once per branch) and moves boundary
    sampling to the driver. Callers at genuine 100 TB scale should prefer
    reliable ``checkpoint()`` (replicated, recoverable) via
    ``spark.sparkContext.setCheckpointDir`` when executor loss is an
    operational concern; semantics are identical."""
    spark = df.sparkSession
    if width is None:
        width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    ranged = df.repartitionByRange(width, F.col(part_col), *order_cols)
    # spark_partition_id is projected UNDER the window's exchange, so it
    # captures the range-split id; the window then re-shuffles by
    # (split, part) — width-many even groups, never one-per-part-value.
    # The tagged frame MUST be materialized before fan-out: the local-rank
    # window and the offset counts are two plan branches, and without a
    # shared materialization each executes its own range exchange — whose
    # split ids need not agree (exchange reuse is not guaranteed, and AQE
    # may coalesce the two instances differently), silently corrupting the
    # offsets. localCheckpoint freezes one pid assignment for both
    # consumers (ranks are pid-independent once the assignment is shared,
    # so reruns stay deterministic).
    tagged = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    w_local = Window.partitionBy(_PID, part_col).orderBy(*order_cols)
    local = tagged.withColumn(_RN, F.row_number().over(w_local))

    counts = tagged.groupBy(_PID, part_col).agg(F.count(F.lit(1)).alias("_c"))
    w_off = (
        Window.partitionBy(part_col)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(part_col)
    offsets = counts.select(
        _PID,
        part_col,
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias(_OFF),
        F.sum("_c").over(w_tot).alias(_N),
    )

    joined = local.join(F.broadcast(offsets), [_PID, part_col])
    rank = F.col(_OFF) + F.col(_RN)
    pr = F.when(
        F.col(_N) > 1,
        (rank - 1).cast("double") / (F.col(_N) - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    cd = rank.cast("double") / F.col(_N).cast("double")
    if round_digits is not None:
        pr = F.round(pr, round_digits)
        cd = F.round(cd, round_digits)
    out = joined.withColumn(pr_name, pr).withColumn(cd_name, cd)

    if dense_col is not None:
        # distinct over the checkpointed frame: reads the materialized
        # blocks instead of re-scanning the source a third time
        distinct_vals = tagged.select(part_col, dense_col).distinct()
        w_dense = Window.partitionBy(part_col).orderBy(dense_col)
        dense_map = distinct_vals.withColumn(
            _DR, F.row_number().over(w_dense)
        )
        out = out.join(F.broadcast(dense_map), [part_col, dense_col])
        out = out.withColumn(dense_name, F.col(_DR))

    return out.drop(_PID, _RN, _OFF, _N, _DR)

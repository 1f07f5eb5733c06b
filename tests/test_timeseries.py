"""Resample-kernel semantics (SURVEY.md J1-J3, F2, F10): gap days survive the
spine join as NULLs, epoch bucketing matches date_trunc, pivot locks column
order, and the spine join broadcasts (no fact-side shuffle)."""

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.operators.timeseries import (
    SECONDS_PER_DAY,
    combine_columns_sum,
    counts_by_day,
    date_spine,
    epoch_bounds,
    gap_fill,
    pivot_by_type,
    resample_daily,
    with_epoch,
)
from aim357_2019_etl_and_ml_workshop_spark.plans import uses_broadcast_join


def _facts(spark):
    # 3 days of data with a one-day gap (Jan 2 missing)
    rows = [
        Row(pickup_datetime=datetime(2018, 1, 1, 8, 0), type="yellow"),
        Row(pickup_datetime=datetime(2018, 1, 1, 9, 0), type="green"),
        Row(pickup_datetime=datetime(2018, 1, 3, 10, 0), type="yellow"),
    ]
    return spark.createDataFrame(rows)


def test_epoch_bucket_matches_date_trunc(spark):
    df = with_epoch(_facts(spark), "pickup_datetime")
    chk = df.select(
        (F.col("epoch").cast("timestamp") == F.date_trunc("day", "pickup_datetime")).alias("ok")
    ).collect()
    assert all(r.ok for r in chk)


def test_resample_preserves_gap_days_as_null(spark):
    res = resample_daily(_facts(spark), "pickup_datetime")
    days = res.select("ts_resampled", "type").orderBy("ts_resampled", "type").collect()
    # Jan 1 has two fact rows, Jan 2 exists with NULL type (gap), Jan 3 one row
    assert len(days) == 4
    gap = [r for r in days if r.ts_resampled == datetime(2018, 1, 2)]
    assert len(gap) == 1 and gap[0].type is None


def test_spine_join_is_broadcast(spark):
    res = resample_daily(_facts(spark), "pickup_datetime")
    assert uses_broadcast_join(res)


def test_counts_pivot_gapfill_end_to_end(spark):
    daily = counts_by_day(_facts(spark), "pickup_datetime", ["type"])
    lo, hi = epoch_bounds(with_epoch(_facts(spark), "pickup_datetime"))
    spine = date_spine(spark, lo, hi).withColumn(
        "ts_resampled", F.col("epoch").cast("timestamp")
    ).drop("epoch")
    wide = pivot_by_type(
        F.broadcast(spine).join(daily, "ts_resampled", "left"),
        "type",
        ["green", "yellow"],
    )
    filled = gap_fill(wide, 0, ["green", "yellow"]).orderBy("ts_resampled")
    assert filled.columns == ["ts_resampled", "green", "yellow"]
    vals = [(r.green, r.yellow) for r in filled.collect()]
    assert vals == [(1, 1), (0, 0), (0, 1)]


def test_combine_columns_sum(spark):
    df = spark.createDataFrame([Row(ts=1, fhv=2, fhvhv=None), Row(ts=2, fhv=1, fhvhv=4)])
    out = combine_columns_sum(df, "full_fhv", ["fhv", "fhvhv"]).orderBy("ts").collect()
    assert [r.full_fhv for r in out] == [2, 5]
    assert "fhv" not in out[0].asDict()


def test_spine_inclusive_bounds(spark):
    spine = date_spine(spark, 0, 3 * SECONDS_PER_DAY)
    assert spine.count() == 4  # inclusive of both endpoints

"""End-to-end golden test (SURVEY.md §5.2 t1 / §7.2 minimum slice):
heterogeneous raw CSVs -> canonicalize (3 schemas) -> union -> strict-bounds
filter -> daily resample -> pivot -> fillna -> JSON Lines export, mirroring
the reference pipeline etl/2019reinvent_*.py ->
GluePySparkMLFeatureEngineering.rst:132-281,718-742."""

import json

import pytest
from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.forecast import to_deepar_jsonlines
from aim357_2019_etl_and_ml_workshop_spark.operators.canonicalize import canonicalize
from aim357_2019_etl_and_ml_workshop_spark.operators.timeseries import (
    counts_by_day,
    date_spine,
    epoch_bounds,
    gap_fill,
    pivot_by_type,
    with_epoch,
)
from aim357_2019_etl_and_ml_workshop_spark.pipeline import alert_check, run_pipeline
from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_csv, write_parquet

YELLOW_CSV = """vendorid,tpep_pickup_datetime,tpep_dropoff_datetime,pulocationid,dolocationid,fare_amount
1,2018-01-01 08:00:00,2018-01-01 08:30:00,10,20,12.5
2,2018-01-01 09:00:00,2018-01-01 09:10:00,11,21,5.0
1,2018-01-03 10:00:00,2018-01-03 10:20:00,12,22,8.0
9,2088-01-24 00:25:00,2088-01-24 00:28:00,151,151,3.5
"""

GREEN_CSV = """vendorid,lpep_pickup_datetime,lpep_dropoff_datetime,pulocationid,dolocationid,fare_amount
2,2018-01-02 11:00:00,2018-01-02 11:30:00,30,40,9.0
2,2018-01-03 12:00:00,2018-01-03 12:15:00,31,41,6.5
"""

FHV_CSV = """pickup_datetime,dropoff_datetime,pulocationid,dolocationid
2018-01-01 13:00:00,2018-01-01 13:45:00,50,60
2018-01-04 14:00:00,2018-01-04 14:20:00,51,61
"""


@pytest.fixture(scope="module")
def canonical(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    frames = []
    for kind, payload in (
        ("yellow", YELLOW_CSV),
        ("green", GREEN_CSV),
        ("fhv", FHV_CSV),
    ):
        p = root / f"{kind}.csv"
        p.write_text(payload)
        raw = read_csv(spark, str(p))
        frames.append(canonicalize(raw, kind, drop_all_null=False))
    union = frames[0].unionByName(frames[1]).unionByName(frames[2])
    out = str(root / "canonical")
    write_parquet(union, out, mode="overwrite", partition_by=["type"])
    return spark.read.parquet(out)


def test_canonical_schema_and_counts(canonical):
    assert canonical.count() == 8
    by_type = {r["type"]: r["n"] for r in canonical.groupBy("type").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by_type == {"yellow": 4, "green": 2, "fhv": 2}
    assert {f.name for f in canonical.schema.fields} == {
        "vendorid", "pickup_datetime", "dropoff_datetime",
        "pulocationid", "dolocationid", "type",
    }
    # fhv rows got the literal vendorid
    assert canonical.where("type = 'fhv'").select("vendorid").distinct().first()[
        0
    ] == "fhv"


def test_resample_pivot_golden(canonical, spark):
    """Strict bounds drop the year-2088 anomaly; Jan 1-4 spine with zero
    fill matches the hand-computed golden table."""
    filtered = canonical.where(
        (F.col("pickup_datetime") > F.lit("2018-01-01").cast("timestamp"))
        & (F.col("pickup_datetime") < F.lit("2019-07-01").cast("timestamp"))
    )
    facts = with_epoch(filtered, "pickup_datetime")
    lo, hi = epoch_bounds(facts)
    spine = date_spine(spark, lo, hi).withColumn(
        "ts_resampled", F.col("epoch").cast("timestamp")
    ).drop("epoch")
    daily = counts_by_day(filtered, "pickup_datetime", ["type"])
    wide = pivot_by_type(
        spine.join(F.broadcast(daily), "ts_resampled", "left"),
        "type",
        ["fhv", "green", "yellow"],
    )
    golden = [
        ("2018-01-01", 1, 0, 2),
        ("2018-01-02", 0, 1, 0),
        ("2018-01-03", 0, 1, 1),
        ("2018-01-04", 1, 0, 0),
    ]
    rows = gap_fill(wide, 0).orderBy("ts_resampled").collect()
    got = [
        (r.ts_resampled.strftime("%Y-%m-%d"), r.fhv, r.green, r.yellow)
        for r in rows
    ]
    assert got == golden


def test_jsonlines_golden(canonical):
    filtered = canonical.where(
        F.col("pickup_datetime") < F.lit("2019-07-01").cast("timestamp")
    )
    daily = counts_by_day(filtered, "pickup_datetime", ["type"])
    out = {
        r["type"]: json.loads(r.jsonline)
        for r in to_deepar_jsonlines(
            daily, "type", "ts_resampled", "count"
        ).collect()
    }
    assert out["yellow"] == {
        "start": "2018-01-01 00:00:00",
        "target": [2.0, 1.0],  # observed days only; gap-fill happens upstream
    }
    assert out["green"]["start"] == "2018-01-02 00:00:00"


def test_pipeline_runner_and_alerts(canonical):
    daily = counts_by_day(canonical, "pickup_datetime", ["type"])
    report = run_pipeline(
        [("daily_counts", lambda: daily)], count_rows=True
    )
    assert report.stages[0].rows == daily.count()
    fired = []
    alerts = alert_check(daily, "count", lo=0, hi=1.5, callback=fired.append)
    assert {a["count"] for a in alerts} == {2}  # only the 2-ride day alerts
    assert len(fired) == len(alerts)


def test_partition_pruning_on_canonical(canonical):
    """The canonical table is partitioned by type; a type filter must prune
    at the source (PartitionFilters), not scan-and-filter."""
    from aim357_2019_etl_and_ml_workshop_spark.plans import formatted_plan

    df = canonical.where(F.col("type") == "yellow").select("pickup_datetime")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    assert df.count() == 4  # only the yellow partition's rows

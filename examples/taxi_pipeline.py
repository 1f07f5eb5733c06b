"""End-to-end demo of the full reference workflow (SURVEY.md §0 steps 1-6)
on synthetic taxi-shaped data — everything a user of the reference runs,
re-expressed on this engine:

1. discover/canonicalize: 3 heterogeneous raw CSV schemas -> typed canonical
   parquet, partitioned, registered in the catalog
2. explore: the reference's SQL shapes via the SQL entry point
3. feature engineering: strict-bounds filter -> daily spine resample ->
   per-type pivot -> zero fill
4. ML export + forecast: DeepAR JSON Lines, cutoff split, quantile forecast
5. evaluate: RMSE + wQuantileLoss
6. alert: threshold check over the forecast (the Step Functions/SNS loop)

Usage: python examples/taxi_pipeline.py [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.forecast import (
    SeasonalQuantileForecaster,
    cutoff_split,
    evaluate,
    to_deepar_jsonlines,
)
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
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from aim357_2019_etl_and_ml_workshop_spark.sources.io import (
    read_csv,
    register_catalog_table,
    write_json_lines,
    write_parquet,
)


def synth_raw_csvs(root: str, days: int = 60, per_day: int = 40) -> dict[str, str]:
    """Deterministic taxi-shaped raw CSVs (3 schema generations + anomalies),
    mirroring FIXTURES.md §A."""
    start = datetime(2018, 1, 1)
    paths = {}
    specs = {
        "yellow": ("vendorid,tpep_pickup_datetime,tpep_dropoff_datetime,"
                   "pulocationid,dolocationid,fare_amount"),
        "green": ("vendorid,lpep_pickup_datetime,lpep_dropoff_datetime,"
                  "pulocationid,dolocationid,fare_amount"),
        "fhv": "pickup_datetime,dropoff_datetime,pulocationid,dolocationid",
    }
    for kind, header in specs.items():
        lines = [header]
        rate = {"yellow": 3, "green": 1, "fhv": 2}[kind]
        for d in range(days):
            if kind == "green" and d % 11 == 0:
                continue  # gap days exercise the spine
            for i in range(per_day * rate // 3 + (d % 3)):
                ts = start + timedelta(days=d, minutes=7 * i + hash(kind) % 9)
                te = ts + timedelta(minutes=15)
                row = {
                    "yellow": f"{1 + i % 2},{ts:%Y-%m-%d %H:%M:%S},{te:%Y-%m-%d %H:%M:%S},{i % 200},{(i * 7) % 200},{8 + i % 20}.5",
                    "green": f"2,{ts:%Y-%m-%d %H:%M:%S},{te:%Y-%m-%d %H:%M:%S},{i % 100},{(i * 3) % 100},{6 + i % 9}.0",
                    "fhv": f"{ts:%Y-%m-%d %H:%M:%S},{te:%Y-%m-%d %H:%M:%S},{i % 50},{(i * 5) % 50}",
                }[kind]
                lines.append(row)
        # future-dated anomalies (the reference's year-2088 rows)
        if kind == "yellow":
            lines.append("9,2088-01-24 00:25:00,2088-01-24 00:28:00,151,151,3.5")
        p = os.path.join(root, f"{kind}.csv")
        with open(p, "w") as f:
            f.write("\n".join(lines))
        paths[kind] = p
    return paths


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="taxi_")
    os.makedirs(workdir, exist_ok=True)
    spark = get_spark("taxi-pipeline-demo")
    raw = synth_raw_csvs(workdir)

    # 1. canonicalize all three generations into one partitioned table
    canon_path = os.path.join(workdir, "canonical")
    frames = [
        canonicalize(read_csv(spark, raw[k]), k, drop_all_null=False)
        for k in ("yellow", "green", "fhv")
    ]
    union = frames[0].unionByName(frames[1]).unionByName(frames[2])
    write_parquet(union, canon_path, mode="overwrite", partition_by=["type"])
    register_catalog_table(spark, "taxi", "canonical", canon_path, ["type"])
    canonical = spark.table("taxi.canonical").cache()
    print("canonical rows:", canonical.count())

    # 2. the reference's SQL exploration shapes over the catalog
    print("rides per type:")
    spark.sql(
        "SELECT type, count(*) AS ride_count FROM taxi.canonical GROUP BY type"
    ).show()
    print("future-dated anomalies:")
    spark.sql(
        "SELECT count(*) AS n FROM taxi.canonical "
        "WHERE CAST(pickup_datetime AS STRING) LIKE '2088%'"
    ).show()

    # 3. gap-free daily features: filter -> spine -> pivot -> fill
    filtered = canonical.where(
        (F.col("pickup_datetime") > F.lit("2018-01-01").cast("timestamp"))
        & (F.col("pickup_datetime") < F.lit("2019-07-01").cast("timestamp"))
    )
    facts = with_epoch(filtered, "pickup_datetime")
    lo, hi = epoch_bounds(facts)
    spine = (
        date_spine(spark, lo, hi)
        .withColumn("ts_resampled", F.col("epoch").cast("timestamp"))
        .drop("epoch")
    )
    daily = counts_by_day(filtered, "pickup_datetime", ["type"])
    wide = gap_fill(
        pivot_by_type(
            spine.join(F.broadcast(daily), "ts_resampled", "left"),
            "type",
            ["fhv", "green", "yellow"],
        ),
        0,
    ).orderBy("ts_resampled")
    print("daily features (head):")
    wide.show(5)

    # 4. ML export + forecast
    train, test = cutoff_split(daily, "ts_resampled", "2018-02-15")
    jsonl = to_deepar_jsonlines(train, "type", "ts_resampled", "count")
    write_json_lines(jsonl.select("jsonline"), os.path.join(workdir, "deepar"))
    fc = SeasonalQuantileForecaster(
        time_freq="D", context_length=14, prediction_length=14
    )
    pred = fc.predict(train, "type", "ts_resampled", "count").cache()
    print("forecast (head):")
    pred.orderBy("series", "ts", "quantile").show(6)

    # 5. evaluate against held-out actuals
    actuals = test.select(
        F.col("type").alias("series"),
        F.col("ts_resampled").alias("ts"),
        F.col("count").alias("y"),
    )
    print("quality metrics:")
    evaluate(pred, actuals).show()

    # 6. alert loop: p50 forecast outside the expected band -> callback
    fired = []
    p50 = pred.where(F.col("quantile") == 0.5)
    alerts = alert_check(p50, "value", lo=1.0, hi=500.0, callback=fired.append)
    print(f"alerts fired: {len(alerts)}")

    report = run_pipeline([("noop-finalize", lambda: None)])
    print("pipeline ok; stage timings:", [(s.name, s.seconds) for s in report.stages])
    if len(sys.argv) <= 1:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()

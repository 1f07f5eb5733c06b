"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the conformance registry
(aim357_2019_etl_and_ml_workshop_spark.queries) that the driver hash-matches
against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aim357_2019_etl_and_ml_workshop_spark import queries as q  # noqa: E402
from aim357_2019_etl_and_ml_workshop_spark.session import pin_session_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the reference's signature
    resample→pivot pipeline (SURVEY.md §7.2) over the events table —
    strict-bounds filter → daily spine resample → per-type pivot →
    zero-fill (gap days survive as zeros)."""
    from pyspark.sql import functions as F

    from aim357_2019_etl_and_ml_workshop_spark.operators.timeseries import (
        date_spine,
        epoch_bounds,
        pivot_by_type,
        with_epoch,
    )
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata

    pin_session_conf(spark)
    sf_dir = "/root/testdata/sf0.001"
    ev = read_testdata(spark, sf_dir, "events")
    lo_ts = F.lit("2024-01-03").cast("timestamp")
    hi_ts = F.lit("2024-01-28").cast("timestamp")
    facts = with_epoch(
        ev.where((F.col("ts") > lo_ts) & (F.col("ts") < hi_ts)), "ts"
    ).cache()  # S11: reused by bounds scan + daily agg, as the reference
    # caches its filtered frame (GluePySparkMLFeatureEngineering.rst:91,179)
    lo, hi = epoch_bounds(facts)
    spine = date_spine(spark, lo, hi)
    daily = facts.groupBy(
        F.col("epoch"), F.col("event_type").alias("type")
    ).agg(F.count(F.lit(1)).alias("count"))
    joined = spine.join(F.broadcast(daily), "epoch", "left").withColumn(
        "ts_resampled", F.col("epoch").cast("timestamp")
    )
    wide = pivot_by_type(joined, "type", q.EVENT_TYPES)
    # pivot of NULL-type gap rows leaves all-null cells; zero-fill and order.
    return wide.na.fill(0, q.EVENT_TYPES).orderBy("ts_resampled")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-matchable query."""
    return q.oracle_sql()

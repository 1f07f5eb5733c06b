"""distributed_rank_stats must be BIT-IDENTICAL to the built-in
one-task-per-part-value window under its total-order contract — including
parts smaller than one range split, a single-row part (percent_rank
defined as 0), and heavy ties on the dense_rank ordering."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.operators.analytics import (
    distributed_rank_stats,
)


def test_distributed_rank_stats_matches_builtin_window(spark):
    rng = random.Random(11)
    rows = []
    # three skewed parts + one singleton part; duplicate prices force the
    # orderkey tiebreaker to matter; 4 dense levels with heavy ties
    for i in range(3000):
        part = rng.choice(["A", "A", "A", "B", "C"])
        rows.append((i, part, rng.randint(0, 400), f"p{rng.randint(1, 4)}"))
    rows.append((99999, "Z", 7, "p2"))  # singleton part: pr must be 0.0
    df = spark.createDataFrame(
        rows, "k long, part string, price long, prio string"
    ).repartition(7)

    w = Window.partitionBy("part").orderBy("price", "k")
    wp = Window.partitionBy("part").orderBy("prio")
    ref = df.select(
        "k",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.dense_rank().over(wp).alias("dr"),
    )
    new = distributed_rank_stats(
        df, "part", [F.col("price"), F.col("k")], dense_col="prio", width=8
    ).select("k", "pr", "cd", "dr")

    j = ref.alias("r").join(new.alias("n"), "k", "full")
    assert j.count() == df.count()
    bad = j.where(
        "r.pr IS DISTINCT FROM n.pr OR r.cd IS DISTINCT FROM n.cd "
        "OR r.dr IS DISTINCT FROM n.dr"
    ).count()
    assert bad == 0
    singleton = new.where("k = 99999").collect()[0]
    assert singleton["pr"] == 0.0 and singleton["cd"] == 1.0

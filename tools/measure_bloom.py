"""Measure the Bloom prefilter's traffic claim (r9): bloom_decontaminate's
contract is "only Bloom-candidate corpus grams reach the verify shuffle" —
this harness runs the SAME hash-first overlap pipeline with and without
the bitmap under a planner with broadcast joins disabled (modeling the
operator's premise: a reference corpus past any broadcast budget), and
sums each run's shuffle bytes via the Spark UI REST API, so the claim is
a measurement, not an argument.

The ablation is exact: the "exact" mode is bloom_decontaminate minus the
bitmap probe (identical gram hashing, identical candidate-side string
build, identical verify join + distinct + count), so the byte delta is
attributable to the prefilter alone.

Usage: python tools/measure_bloom.py [sf_dir]
Prints one JSON line: {mode: {"sec": s, "shuffle_write_mb": m, ...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.operators.curation import (
    _bloom_gram_str,
    _bloom_grams,
    bloom_decontaminate,
)
from aim357_2019_etl_and_ml_workshop_spark.session import pin_session_conf
from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata


def stage_totals(ui: str, app: str) -> dict:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return {
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "ids": {s["stageId"] for s in stages},
        "raw": {s["stageId"]: s for s in stages},
    }


def new_stage_detail(before: dict, after: dict) -> list:
    rows = []
    for sid in sorted(after["ids"] - before["ids"]):
        s = after["raw"][sid]
        w = s.get("shuffleWriteBytes", 0)
        if w:
            rows.append(
                {
                    "stage": sid,
                    "write_mb": round(w / 2**20, 1),
                    "name": s.get("name", "")[:60],
                }
            )
    return sorted(rows, key=lambda r: -r["write_mb"])[:6]


def exact_overlap_no_bloom(corpus, reference, n=5, prefix=200):
    """bloom_decontaminate with the bitmap probe removed — every corpus
    gram goes to the verify join (what a no-broadcast-budget planner must
    do without the prefilter)."""
    ref = _bloom_grams(reference, "text", "doc_id", n, prefix)
    pairs = ref.select(
        "h", _bloom_gram_str(F.col("_p") + 1, n).alias("sh")
    ).distinct()
    cand = _bloom_grams(corpus, "text", "doc_id", n, prefix).select(
        F.col("doc_id"), "h", _bloom_gram_str(F.col("_p") + 1, n).alias("_shc")
    )
    return (
        cand.join(pairs, "h")
        .where(F.col("_shc") == F.col("sh"))
        .select("doc_id", "sh")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bloom-ab")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "8g")
        # the operator's premise: reference too big to broadcast — make the
        # planner honor it so the exact baseline shows its true shuffle
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    pin_session_conf(spark)
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    docs = read_testdata(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    ref = docs.where(F.col("doc_id") % 7 == 0)

    runners = {
        "exact_no_bloom": lambda: exact_overlap_no_bloom(corpus, ref),
        "bloom_prefilter": lambda: bloom_decontaminate(corpus, ref),
    }
    out = {}
    for mode, run in runners.items():
        before = stage_totals(ui, app)
        t0 = time.perf_counter()
        run().write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        after = stage_totals(ui, app)
        out[mode] = {
            "sec": round(sec, 2),
            "shuffle_write_mb": round(
                (after["shuffle_write"] - before["shuffle_write"]) / 2**20, 1
            ),
            "shuffle_read_mb": round(
                (after["shuffle_read"] - before["shuffle_read"]) / 2**20, 1
            ),
            "top_stages": new_stage_detail(before, after),
        }
    print(json.dumps({"sf_dir": sf_dir, **out}, indent=1, default=str))


if __name__ == "__main__":
    main()

"""Measure the ACTUAL shuffle bytes behind the repeated-span modes
(VERDICT r07 #2 follow-through): the hash-first mode's contract is
"8 bytes/span through the frequency shuffle instead of the joined
string" — this harness runs each mode once at a given SF and sums the
shuffle WRITE bytes of every stage of that run via the Spark UI REST
API, so the byte claim is a measurement, not an argument.

Usage: python tools/measure_span_shuffle.py [sf_dir]
Prints one JSON line: {mode: {"sec": s, "shuffle_write_mb": m, ...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark


def stage_totals(ui: str, app: str) -> dict:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return {
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "n_stages": len(stages),
        "ids": {s["stageId"] for s in stages},
        "raw": {s["stageId"]: s for s in stages},
    }


def new_stage_detail(before: dict, after: dict) -> list:
    """Per-stage (name, write MB) for stages that ran between snapshots,
    largest writers first — attributes WHICH exchange carries the bytes."""
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10"
    # the engine session disables the UI; this harness needs the REST
    # metrics endpoint, so re-enable it for this process only
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    spark = get_spark("span-shuffle-ab")
    if spark.sparkContext.uiWebUrl is None:
        spark.stop()
        from pyspark.sql import SparkSession

        from aim357_2019_etl_and_ml_workshop_spark.session import (
            pin_session_conf,
        )

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("span-shuffle-ab")
            .config("spark.sql.shuffle.partitions", cpus)
            .config("spark.ui.enabled", "true")
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
        pin_session_conf(spark)
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    registry = q.queries()

    synthetic = os.environ.get("SPAN_SHUFFLE_SYNTH", "") == "1"
    if synthetic:
        # The regime the hash mode is FOR: a mostly-unique corpus (real
        # post-exact-dedup web text) where map-side combine cannot
        # collapse the string frequency shuffle. 200k docs of 12 unique
        # 32-char tokens each + 2k sharing one boilerplate line.
        from pyspark.sql import functions as F

        from aim357_2019_etl_and_ml_workshop_spark.operators.dedup import (
            repeated_ngram_spans,
        )

        uniq = spark.range(200_000).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", *[F.md5(F.concat(F.col("id").cast("string"), F.lit(c)))
                       for c in "abcdefghijkl"]
            ).alias("text"),
        )
        boiler = spark.range(200_000, 202_000).select(
            F.col("id").alias("doc_id"),
            F.lit("terms of service privacy policy all rights reserved "
                  "contact us careers press blog").alias("text"),
        )
        corpus = uniq.unionByName(boiler).repartition(32).persist()
        corpus.count()
        runners = {
            "string": lambda: repeated_ngram_spans(corpus, "text", "doc_id"),
            "hashed": lambda: repeated_ngram_spans(
                corpus, "text", "doc_id", hash_spans=True
            ),
        }
    else:
        runners = {
            "string": lambda: registry["repeated_ngram_spans"](spark, sf_dir),
            "hashed": lambda: registry["repeated_ngram_spans_hashed"](
                spark, sf_dir
            ),
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
        if not synthetic:  # keep the synthetic corpus persisted across modes
            spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, **out}, indent=1, default=str))


if __name__ == "__main__":
    main()

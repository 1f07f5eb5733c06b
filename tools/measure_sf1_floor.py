"""Quantify the sf1 fixed-cost floor and try cheap levers (VERDICT r04 #4).

The sf1 suite ratio (BENCH_r04: 3.0x vs DuckDB) is hypothesized to be a
per-query scheduling/compile floor x 26 queries, not plan defects. This
harness measures, in one process:

  floor    — 26 trivial jobs (spark.range(1) noop write) in a warm
             session: pure scheduling + py4j + sink overhead, zero data.
  default  — the bench SF1_SUBSET, min-of-2 per query, default session.
  aqe_off  — same, spark.sql.adaptive.enabled=false (AQE inserts stage
             materialization barriers + replanning per shuffle — pure
             overhead at 190 MB, load-bearing at cluster scale).
  par_last — same, adaptive.coalescePartitions.parallelismFirst=false
             (fewer, larger post-shuffle partitions -> fewer tasks).

Each lever gets a fresh SparkSession (confs are session-bound; several
are non-runtime). DuckDB denominator re-timed in-process for an honest
same-box ratio.

Usage: python tools/measure_sf1_floor.py [sf1_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark

from bench import SF1_SUBSET, duckdb_suite, spark_suite


def floor_probe(spark, n: int) -> float:
    t0 = time.perf_counter()
    for _ in range(n):
        spark.range(1).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def sweep(extra_conf: dict, sf_dir: str, runs: int) -> dict:
    spark = get_spark("sf1-floor")
    for k, v in extra_conf.items():
        spark.conf.set(k, v)
    try:
        warm = floor_probe(spark, 3)  # JIT/session warmup, untimed
        floor = floor_probe(spark, len(SF1_SUBSET))
        timings = spark_suite(spark, q.queries(), sf_dir, SF1_SUBSET, runs)
        return {
            "floor_sec": floor,
            "suite_sec": round(sum(timings.values()), 2),
            "slowest": dict(
                sorted(timings.items(), key=lambda kv: -kv[1])[:5]
            ),
        }
    finally:
        spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out = {"sf_dir": sf_dir, "runs": runs}
    oracle = duckdb_suite(sf_dir, SF1_SUBSET)
    out["duckdb_sec"] = oracle["value"]
    for label, conf in [
        ("default", {}),
        ("aqe_off", {"spark.sql.adaptive.enabled": "false"}),
        (
            "par_last",
            {
                "spark.sql.adaptive.coalescePartitions.parallelismFirst": (
                    "false"
                )
            },
        ),
    ]:
        out[label] = sweep(conf, sf_dir, runs)
        out[label]["ratio"] = round(
            out[label]["suite_sec"] / oracle["value"], 2
        )
        print(f"  {label}: {out[label]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

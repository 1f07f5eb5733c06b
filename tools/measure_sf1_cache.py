"""sf1 floor, last lever (VERDICT r07 #8): does a per-suite in-memory
cache of the hot tables close the sf1 suite ratio to <= 2.0x?

Measures the bench SF1_SUBSET at .localdata/sf1 three ways, same
min-of-N + warm-pass methodology as bench.py:

  A. baseline — bench.py's exact procedure (clearCache between runs);
  B. cached   — lineitem/orders/events/documents/embeddings persisted
     and materialized ONCE before the suite; runs do NOT clearCache (so
     the table caches survive — this also lets queries' internal
     persists coast across their own runs, so B is an UPPER BOUND on
     the cache benefit, which is the right direction for a
     retire-or-waive decision);
  C. the DuckDB denominator (bench.duckdb_suite, min-of-3 + warm).

Fairness note for the writeup: DuckDB's read_parquet views have no
private buffer pool — both engines re-decode parquet per query from the
same OS page cache — so a Spark InMemoryRelation is an advantage DuckDB
is NOT given. If B crosses the bar, it publishes as a separately
labeled variant, never as the apples-to-apples ratio.

Usage: python tools/measure_sf1_cache.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF1_SUBSET, duckdb_suite, spark_suite

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata

HOT_TABLES = ["lineitem", "orders", "events", "documents", "embeddings"]


def suite_no_clear(spark, registry, sf_dir, names, runs):
    """spark_suite without the inter-run clearCache (variant B)."""
    timings = {}
    for name in names:
        fn = registry[name]
        best = None
        for i in range(runs + 1):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i > 0:
                best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
    return timings


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf1_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf1",
    )
    oracle = duckdb_suite(sf1_dir, SF1_SUBSET, runs)

    spark = get_spark("sf1-cache-ab")
    registry = q.queries()
    registry["global_count"](spark, sf1_dir).collect()

    base = spark_suite(spark, registry, sf1_dir, SF1_SUBSET, runs, warm_pass=True)

    cached = []
    for t in HOT_TABLES:
        df = read_testdata(spark, sf1_dir, t).persist()
        df.count()
        cached.append(df)
    try:
        hot = suite_no_clear(spark, registry, sf1_dir, SF1_SUBSET, runs)
    finally:
        for df in cached:
            df.unpersist(blocking=False)
        spark.catalog.clearCache()

    def block(t):
        covered = [n for n in t if n in oracle["queries"]]
        tot = round(sum(t[n] for n in covered), 4)
        return {
            "total_sec": round(sum(t.values()), 4),
            "covered_sec": tot,
            "ratio": round(tot / oracle["value"], 3),
            "queries": t,
        }

    out = {
        "oracle_sec": oracle["value"],
        "runs": runs,
        "baseline": block(base),
        "cached_tables": block(hot),
        "hot_tables": HOT_TABLES,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".localdata",
        "sf1_cache_ab.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("oracle_sec", "runs")}, indent=None))
    print("baseline ", out["baseline"]["total_sec"], "ratio", out["baseline"]["ratio"])
    print("cached   ", out["cached_tables"]["total_sec"], "ratio", out["cached_tables"]["ratio"])
    print(f"detail: {path}")


if __name__ == "__main__":
    main()

"""Settle the stats_moments_by_flag sf10 discrepancy (VERDICT r04 "What's
wrong" #1): SOAK_r04 recorded 19.8 s in-soak while PERF.md's isolated
min-of-2 is 3.3 s — a 6x gap no other query showed.

Protocol: in ONE JVM (like the soak),
  phase A  "cold+isolated": run the query 3x on a fresh session;
  phase B  "pressure": run the two heaviest linear registry queries that
           precede it in a soak sweep (tfidf_features,
           decontaminate_ngram_overlap) once each;
  phase C  "in-soak-like": run the query 3x again.
Per run we record wall seconds plus the JVM-wide GC time delta (local
mode: executors live in the driver JVM, so ManagementFactory GC beans see
everything) and the heap in use at run start. If C >> A with GC delta
accounting for the gap, the soak number is JVM heap pressure from the
sweep, not a plan defect.

Usage: python tools/measure_stats_moments.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark


def jvm_gc_millis(spark) -> int:
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    return sum(
        b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans()
    )


def heap_used_mb(spark) -> int:
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    return int(mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() / 2**20)


def run_once(spark, name, sf_dir) -> dict:
    gc0, heap0 = jvm_gc_millis(spark), heap_used_mb(spark)
    t0 = time.perf_counter()
    q.queries()[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    sec = round(time.perf_counter() - t0, 2)
    spark.catalog.clearCache()
    return {
        "sec": sec,
        "gc_ms": jvm_gc_millis(spark) - gc0,
        "heap_start_mb": heap0,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10"
    target = "stats_moments_by_flag"
    spark = get_spark("stats-moments-measure")
    out = {"sf_dir": sf_dir, "target": target}

    out["isolated"] = [run_once(spark, target, sf_dir) for _ in range(3)]
    out["pressure"] = {
        n: run_once(spark, n, sf_dir)["sec"]
        for n in ("tfidf_features", "decontaminate_ngram_overlap")
    }
    out["in_soak_like"] = [run_once(spark, target, sf_dir) for _ in range(3)]
    print(json.dumps(out))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            json.dump(out, f)
    spark.stop()


if __name__ == "__main__":
    main()

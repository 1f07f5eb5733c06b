"""V2 (VERDICT r12 next #2): per-query 8-vs-32-core scaling profile at sf10.

Runs the bench's SF10_SUBSET through bench.spark_suite at the CURRENT
$SPARK_GRAFT_CPUS (the caller runs this twice: once with 32, once with 8)
and prints one JSON line of per-query best-of-N seconds. The two runs are
separate processes by necessity (local[N] is fixed at JVM launch), so each
run uses the same warm-pass + min-of-runs treatment bench.py uses; compare
minima, not single passes.

Usage: SPARK_GRAFT_CPUS=32 python tools/sf10_scaling.py /root/repo/.localdata/sf10
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF10_SUBSET, spark_suite  # noqa: E402
from aim357_2019_etl_and_ml_workshop_spark import queries as q  # noqa: E402
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark("sf10-scaling")
    registry = q.queries()
    registry["global_count"](spark, sf_dir).collect()
    timings = spark_suite(
        spark, registry, sf_dir, SF10_SUBSET, runs, warm_pass=True
    )
    print(
        json.dumps(
            {
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                "sf_dir": sf_dir,
                "runs": runs,
                "total": round(sum(timings.values()), 2),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Multi-JVM smoke: run representative queries under local-cluster[2,4,...]
(separate executor JVMs, real serialization + broadcast transport) and print
one JSON line of results.

local[*] hides two classes of cluster bug: closures that capture
non-serializable driver state (never serialized in-process) and broadcast /
shuffle size assumptions (everything is a local memory reference). The
driver conformance gate runs single-JVM, so this smoke is the only place
the engine's code paths cross a process boundary — VERDICT r04 #7.

Usage: python tools/local_cluster_smoke.py [sf_dir]
Prints: {"flagship_rows": N, "banded_pairs": N, "component_rows": N}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # 2 workers x 4 cores, 2 GiB each: enough for sf0.001 with headroom,
    # small enough to start fast.
    spark = get_spark(
        "local-cluster-smoke", master="local-cluster[2,4,2048]"
    )
    try:
        from aim357_2019_etl_and_ml_workshop_spark import queries as q

        reg = q.queries()
        flagship_rows = reg["flagship_daily_type_counts"](spark, sf_dir).count()
        # Banded near-dup + connected components: exercises the pandas_udf
        # Arrow path, persisted shingle/candidate tables, a broadcast
        # semi-join, and the iterative label-propagation loop — the most
        # serialization-heavy pipeline in the engine.
        banded = reg["neardup_clusters_banded"](spark, sf_dir)
        component_rows = banded.count()
        pair_rows = reg["minhash_recall_check"](spark, sf_dir).count()
        print(
            json.dumps(
                {
                    "flagship_rows": flagship_rows,
                    "component_rows": component_rows,
                    "recall_rows": pair_rows,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

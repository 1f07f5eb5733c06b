"""Multi-JVM smoke: run representative queries under local-cluster[2,4,...]
(separate executor JVMs, real serialization + broadcast transport) and print
one JSON line of results.

local[*] hides two classes of cluster bug: closures that capture
non-serializable driver state (never serialized in-process) and broadcast /
shuffle size assumptions (everything is a local memory reference). The
driver conformance gate runs single-JVM, so this smoke is the only place
the engine's code paths cross a process boundary — VERDICT r04 #7.

Round-6 extension (VERDICT r05 #2): adds the driver-gather ANN paths —
lsh_ann_topk / ivf_ann_topk, whose kernels read a SparkContext-broadcast
numpy gather matrix inside Arrow workers (the strongest closure/broadcast
assumption in the engine) — compared VALUE-level via a row hash, and one
arbitrary-stateful streaming op (running_stats over
applyInPandasWithState), whose GroupState handling crosses the JVM/Python
boundary per executor.

Usage: python tools/local_cluster_smoke.py [sf_dir] [master]
Prints one JSON line consumed by tests/test_local_cluster.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark.session import get_spark


def df_value_hash(df) -> str:
    """Deterministic value-level fingerprint: md5 over the sorted repr of
    all rows (floats pre-rounded by the queries themselves)."""
    rows = sorted(repr(tuple(r)) for r in df.collect())
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def stateful_stream_result(spark) -> dict:
    """running_stats (applyInPandasWithState) over a 2-micro-batch file
    stream; returns the final per-key stats. State must survive batch
    boundaries ON EXECUTORS — under local-cluster the state store and the
    Python stateful workers live in separate JVM processes."""
    from aim357_2019_etl_and_ml_workshop_spark.streaming.stateful import (
        running_stats,
    )

    src = tempfile.mkdtemp(prefix="lc_smoke_rs_")
    try:
        schema = "k string, v double"
        spark.createDataFrame(
            [("a", 1.0), ("a", 5.0), ("b", -2.0)], schema
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_stats(stream, "k", "v")
            .writeStream.format("memory")
            .queryName("lc_stateful_stats")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            spark.createDataFrame([("a", 0.5)], schema).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
            rows = spark.sql(
                "select k, max(n) n, min(v_min) mn, max(v_max) mx, "
                "max(total) s from lc_stateful_stats group by k"
            ).collect()
            return {r["k"]: [r["n"], r["mn"], r["mx"], r["s"]] for r in rows}
        finally:
            q.stop()
            spark.catalog.dropTempView("lc_stateful_stats")
    finally:
        shutil.rmtree(src, ignore_errors=True)


def collect_results(spark, sf_dir: str) -> dict:
    from aim357_2019_etl_and_ml_workshop_spark import queries as q

    reg = q.queries()
    banded = reg["neardup_clusters_banded"](spark, sf_dir)
    return {
        "flagship_rows": reg["flagship_daily_type_counts"](
            spark, sf_dir
        ).count(),
        # Banded near-dup + connected components: exercises the pandas_udf
        # Arrow path, persisted shingle/candidate tables, a broadcast
        # semi-join, and the iterative label-propagation loop — the most
        # serialization-heavy batch pipeline in the engine.
        "component_rows": banded.count(),
        "recall_rows": reg["minhash_recall_check"](spark, sf_dir).count(),
        # Driver-gather ANN, value-level: the kernels gather candidate
        # vectors from a SparkContext numpy broadcast inside mapInPandas
        # workers; hashes must match local[*] bit-for-bit (sims are
        # round(·, 6) in the operators).
        "lsh_hash": df_value_hash(reg["lsh_ann_topk"](spark, sf_dir)),
        "ivf_hash": df_value_hash(reg["ivf_ann_topk"](spark, sf_dir)),
        "stateful_stats": stateful_stream_result(spark),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    master = sys.argv[2] if len(sys.argv) > 2 else "local-cluster[2,4,2048]"
    # 2 workers x 4 cores, 2 GiB each: enough for sf0.001 with headroom,
    # small enough to start fast.
    spark = get_spark("local-cluster-smoke", master=master)
    try:
        print(json.dumps(collect_results(spark, sf_dir)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

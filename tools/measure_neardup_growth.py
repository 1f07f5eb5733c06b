"""Attribute neardup_clusters_banded's sf1 -> sf10 growth (VERDICT r09
next #4: 9.89 s -> 177 s, ~18x for 10x data — the worst entry in the
SOAK_r09 sweep, below the 2x-superlinear flag line but worth a model).

Hypotheses to discriminate:
  (a) PAIR-MASS growth — the verified near-dup pair set grows faster
      than the corpus (duplicate groups get BIGGER as the corpus grows,
      and a group of size g contributes ~g^2/2 verified pairs), so the
      component stage's input itself is superlinear; and/or
  (b) COMPONENT-ITERATION growth — the edge list crosses
      connected_components' small_graph_threshold (1M edges) somewhere
      between sf1 and sf10, switching from the driver union-find
      (one collect, zero shuffle rounds) to pointer-jumping
      (O(log d) shuffle rounds, each a join+groupBy+localCheckpoint).

The script measures, per SF: corpus rows, wall time and output size of
the pair stage (minhash_near_duplicates, materialized via noop), the
edge count the component stage sees (2x distinct directed pairs), which
path it takes, and the component stage's wall time. Output: one JSON
blob for PERF.md.

Usage: python tools/measure_neardup_growth.py [sf1_dir [sf10_dir]]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aim357_2019_etl_and_ml_workshop_spark.operators.dedup import (  # noqa: E402
    connected_components,
    minhash_near_duplicates,
)
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark  # noqa: E402
from aim357_2019_etl_and_ml_workshop_spark.sources.io import (  # noqa: E402
    read_testdata,
)


def measure(spark, sf_dir: str) -> dict:
    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    t0 = time.perf_counter()
    pairs = minhash_near_duplicates(
        docs, "text", "doc_id", threshold=0.05, num_hashes=32, bands=16,
        eager_release=True,
    ).persist()
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0

    # group-size distribution of the pair graph: degree histogram tells
    # us whether duplicate GROUPS grow with the corpus (pair mass ~ g^2)
    deg = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    deg_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("deg").alias("max_deg"),
        F.round(F.avg("deg"), 2).alias("avg_deg"),
    ).collect()[0]

    t0 = time.perf_counter()
    comps = connected_components(pairs, "id_a", "id_b")
    comp_stats = comps.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.count_distinct("comp").alias("n_components"),
    ).collect()[0]
    t_comp = time.perf_counter() - t0
    pairs.unpersist(blocking=False)

    n_edges = 2 * n_pairs  # both directions, pre-distinct upper bound
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "pair_stage_sec": round(t_pairs, 2),
        "n_pairs": n_pairs,
        "pairs_per_doc": round(n_pairs / max(n_docs, 1), 3),
        "n_nodes_in_graph": deg_stats["n_nodes"],
        "max_degree": deg_stats["max_deg"],
        "avg_degree": float(deg_stats["avg_deg"]),
        "component_stage_sec": round(t_comp, 2),
        "n_components": comp_stats["n_components"],
        "directed_edge_upper_bound": n_edges,
        "component_path": (
            "driver_union_find" if n_edges <= 1_000_000 else "pointer_jumping"
        ),
    }


def main() -> None:
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        base, ".localdata", "sf1"
    )
    sf10 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        base, ".localdata", "sf10"
    )
    spark = get_spark("neardup-growth")
    out = {"sf1": measure(spark, sf1), "sf10": measure(spark, sf10)}
    a, b = out["sf1"], out["sf10"]
    out["attribution"] = {
        "docs_growth": round(b["n_docs"] / a["n_docs"], 2),
        "pair_growth": round(b["n_pairs"] / max(a["n_pairs"], 1), 2),
        "pair_stage_time_growth": round(
            b["pair_stage_sec"] / max(a["pair_stage_sec"], 1e-9), 2
        ),
        "component_time_growth": round(
            b["component_stage_sec"] / max(a["component_stage_sec"], 1e-9), 2
        ),
        "path_switch": a["component_path"] != b["component_path"],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

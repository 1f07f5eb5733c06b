"""A/B harness for revenue_by_region (VERDICT r06 #2 — three-round waiver).

Variant A = the registry form (per-order BIGINT partial agg on l_orderkey,
shuffle join to orders, broadcast dims).
Variant B = broadcast-map form: orders x broadcast(cust->nation->region)
builds an (o_orderkey, r_name) map with NO shuffle, that map is broadcast
into the lineitem scan, and the aggregate runs directly by r_name with
counter-bucket BIGINT partials -> decimal merge. Zero wide exchanges.

Both must produce identical sorted results (checked). Usage:

    AB_RUNS=4 python tools/ab_revenue.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from aim357_2019_etl_and_ml_workshop_spark import queries as Q


def variant_b(spark, sf_dir):
    li = Q._t(spark, sf_dir, "lineitem")
    orders = Q._t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = Q._t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = Q._t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = Q._t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    okey_region = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("o_orderkey", "r_name")
    )
    pi = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    di = F.round((F.lit(1) - F.col("l_discount")) * 100, 0).cast("bigint")
    b = F.shiftrightunsigned(F.monotonically_increasing_id(), 20)
    part = (
        li.join(F.broadcast(okey_region), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(b.alias("_b"), "r_name")
        .agg(F.sum(pi * di).alias("_rev_e4"), F.count(F.lit(1)).alias("_n"))
    )
    return part.groupBy("r_name").agg(
        F.round(F.sum(F.col("_rev_e4").cast("decimal(38,0)")) / F.lit(10_000), 2)
        .cast("double")
        .alias("revenue"),
        F.sum("_n").cast("bigint").alias("n_items"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(os.environ.get("AB_RUNS", "4"))
    spark = get_spark("ab-revenue")
    builders = {"A_registry": lambda: Q._REGISTRY["revenue_by_region"](spark, sf_dir),
                "B_bcast_map": lambda: variant_b(spark, sf_dir)}
    rows = {}
    out = {"sf_dir": sf_dir, "times": {}}
    for name, build in builders.items():
        ts = []
        for _ in range(runs):
            t0 = time.monotonic()
            res = sorted(map(tuple, build().collect()))
            ts.append(round(time.monotonic() - t0, 3))
        rows[name] = res
        out["times"][name] = {"runs": ts, "min": min(ts[1:]) if len(ts) > 1 else ts[0]}
    out["results_equal"] = rows["A_registry"] == rows["B_bcast_map"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Bisect which preceding bench query inflates ivf_ann_topk.
Usage: python tools/ab_ctx_bisect.py <query1,query2,...>
Runs the named queries (2 noop runs each, clearCache between — bench
semantics), then ivf_ann_topk 4 times, printing each run."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from bench import spark_suite

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-bisect")
registry = q.queries()
registry["global_count"](spark, sf_dir).collect()
pre_names = [n for n in (sys.argv[1].split(",") if len(sys.argv) > 1 and sys.argv[1] else [])]

# seed ivf centroid cache + codegen so the measured runs are steady-state
spark_suite(spark, registry, sf_dir, ["ivf_ann_topk"], 2)
base = []
for _ in range(3):
    t0 = time.perf_counter()
    registry["ivf_ann_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    base.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()

pre = spark_suite(spark, registry, sf_dir, pre_names, 2) if pre_names else {}
after = []
for _ in range(4):
    t0 = time.perf_counter()
    registry["ivf_ann_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    after.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
print(json.dumps({"pre": pre_names, "ivf_before": base, "ivf_after": after}))

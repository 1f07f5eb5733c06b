"""Residual-cause test: after lsh contamination (+broadcast destroy), does
forcing fresh Python workers restore ivf speed? Toggles
spark.python.worker.reuse at runtime between measurements."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from bench import spark_suite

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
made = []
real_broadcast = pyspark.SparkContext.broadcast
def tracking(self, v):
    b = real_broadcast(self, v)
    made.append(b)
    return b
pyspark.SparkContext.broadcast = tracking  # type: ignore

spark = get_spark("ab-reuse")
registry = q.queries()
registry["global_count"](spark, sf_dir).collect()
spark_suite(spark, registry, sf_dir, ["ivf_ann_topk"], 2)
base = spark_suite(spark, registry, sf_dir, ["ivf_ann_topk"], 3)
spark_suite(spark, registry, sf_dir, ["lsh_ann_topk"], 2)
for b in made:
    b.destroy()
made.clear()

def four(label):
    out = []
    for _ in range(4):
        t0 = time.perf_counter()
        registry["ivf_ann_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    return out

after = four("reuse-on")
try:
    spark.conf.set("spark.python.worker.reuse", "false")
    toggled = True
except Exception:
    toggled = False
after_fresh = four("reuse-off") if toggled else None
print(json.dumps({"ivf_base_min3": base, "after_destroy": after,
                  "after_reuse_off": after_fresh}))

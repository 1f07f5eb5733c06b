"""Does an ALIVE (referenced, never-destroyed) sc.broadcast slow unrelated
Python-UDF jobs, or is the cost only in creation/GC churn?
Times ivf min-of-3 with 0, then 2, then 8 alive 1MB broadcasts."""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from bench import spark_suite

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-alive")
registry = q.queries()
registry["global_count"](spark, sf_dir).collect()
spark_suite(spark, registry, sf_dir, ["ivf_ann_topk"], 2)

keep = []
out = {}
for total in (0, 2, 8):
    while len(keep) < total:
        keep.append(spark.sparkContext.broadcast(
            (np.arange(2000, dtype=np.int64),
             np.random.default_rng(len(keep)).random((2000, 64)),
             np.ones(2000))))
    out[f"alive_{total}"] = spark_suite(
        spark, registry, sf_dir, ["ivf_ann_topk"], 3)["ivf_ann_topk"]
print(json.dumps(out))

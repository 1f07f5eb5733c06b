"""Reproduce ivf_ann_topk in bench suite context: run the queries that
precede it in HEADLINE (noop sink + clearCache, exactly like bench.py's
spark_suite), then time ivf_ann_topk min-of-3. Compares against the
isolated ~1.2 s from tools/ab_ivf.py to localize the r5 drift."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from bench import HEADLINE, spark_suite

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-suite-ctx")
registry = q.queries()
registry["global_count"](spark, sf_dir).collect()

upto = HEADLINE[: HEADLINE.index("ivf_ann_topk")]
pre = spark_suite(spark, registry, sf_dir, upto, 2)
ivf = spark_suite(spark, registry, sf_dir, ["ivf_ann_topk"], 3)
post = spark_suite(spark, registry, sf_dir, ["ivf_ann_topk"], 3)
print(json.dumps({"pre_total": round(sum(pre.values()), 2),
                  "pre": {k: round(v, 2) for k, v in pre.items()},
                  "ivf_in_ctx_min_of_3": ivf["ivf_ann_topk"],
                  "ivf_again_min_of_3": post["ivf_ann_topk"]}))

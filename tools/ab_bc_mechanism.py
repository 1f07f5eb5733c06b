"""Mechanism test: is lsh's SparkContext broadcast what slows later ivf runs?
Modes (unknown modes error rather than silently running stock):
- 'bc' (default): stock lsh behavior.
- 'track': wrap SparkContext.broadcast to record every Broadcast created.
- 'destroy': like 'track', then explicitly destroy() the recorded
  broadcasts right after lsh — isolates abandoned-broadcast churn.
Then time ivf either way."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.operators import similarity
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from bench import spark_suite

mode = sys.argv[1] if len(sys.argv) > 1 else "bc"
if mode not in ("bc", "track", "destroy"):
    raise SystemExit(f"unknown mode {mode!r}: expected bc | track | destroy")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-bc")
registry = q.queries()
registry["global_count"](spark, sf_dir).collect()

made = []
if mode in ("destroy", "track"):
    import pyspark
    real_broadcast = pyspark.SparkContext.broadcast

    def tracking(self, v):
        b = real_broadcast(self, v)
        made.append(b)
        return b

    pyspark.SparkContext.broadcast = tracking  # type: ignore

spark_suite(spark, registry, sf_dir, ["ivf_ann_topk"], 2)  # seed caches
base = spark_suite(spark, registry, sf_dir, ["ivf_ann_topk"], 3)
pre = spark_suite(spark, registry, sf_dir, ["lsh_ann_topk"], 2)
if mode == "destroy":
    # the r6-era per-call gathers this mode was built to destroy are now
    # memoized in similarity._GATHER_BC_CACHE — destroying the tracked
    # objects directly would leave destroyed broadcasts in the live memo
    # and crash the ivf timing loop below on a cache hit. Route through
    # the memo's own lifecycle hook (empties the cache AND destroys),
    # then destroy any tracked broadcast the memo didn't own.
    similarity.clear_gather_cache(destroy=True)
    for b in made:
        try:
            b.destroy()
        except Exception:
            pass  # already destroyed via the cache clear
    made.clear()
after = []
for _ in range(4):
    t0 = time.perf_counter()
    registry["ivf_ann_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    after.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
print(json.dumps({"mode": mode, "lsh": pre, "ivf_base_min3": base, "ivf_after": after}))

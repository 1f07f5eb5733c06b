"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing uses a noop sink so we measure plan execution, not driver collect
bandwidth; each query runs once after a warmup of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark

HEADLINE = [
    "flagship_daily_type_counts",
    "q1_pricing_summary",
    "revenue_by_region",
    "customer_order_stats",
    "pivot_daily_by_type",
    "spine_left_join_gapfill",
    "tumbling_hourly_counts",
    "window_daily_diff",
    "dedup_docs_fingerprint",
    "ngram_jaccard_pairs",
    "minhash_near_duplicates",
    "embedding_cosine_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "text_quality",
    "lang_id_heuristic",
    "bpe_token_count",
    "rolling_hash_fingerprint",
    "sessionize_user_counts",
    "latest_state_per_user",
    "asof_join_last_signup",
    "range_join_campaign_counts",
    "sliding_window_counts",
    "forecast_quantiles",
    "stats_moments_by_flag",
    "cumulative_daily_revenue",
    "decontaminate_ngram_overlap",
    "pii_redaction_rollup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("engine-bench")
    registry = q.queries()

    # Warmup: JVM + parquet footer caches, one tiny action.
    registry["global_count"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

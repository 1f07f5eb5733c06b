"""Scale-posture lint: no registry query may move FACT-SIZED data to a
single partition. Exchange SinglePartition is the canonical scale-killer
(global sort / unpartitioned window over the full table); the whitelist
below enumerates the only legitimate shapes, each with its justification —
any new query that introduces one fails this test until it is either fixed
or explicitly justified here."""

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.plans import (
    single_partition_exchanges,
)

# name -> why the single-partition exchange is safe at 100TB
WHITELIST = {
    # final gather of a scalar aggregate: partial aggregation reduced each
    # partition to one row before the exchange, so the single partition
    # receives #partitions rows, not the table
    "global_count": "scalar agg final gather",
    "union_tagged_counts": "per-branch scalar agg final gather",
    "upper_bound_sanity_count": "scalar agg final gather",
    "min_max_epoch_bounds": "scalar agg final gather",
    "count_distinct_users": "scalar agg final gather",
    "orders_above_avg_price": "broadcast scalar avg subquery gather",
    "profile_orders": "one-pass profile scalar agg gather",
    "quality_expectations_orders": "one-pass expectations scalar agg gather",
    "dormant_rich_customers": "broadcast scalar avg-threshold subquery gather",
    "top_supplier_revenue": "broadcast scalar max-over-agg subquery gather",
    "part_revenue_concentration": "broadcast (count,sum)-over-agg gather",
    "forecast_revenue_delta": "scalar agg final gather",
    "promo_revenue_pct": "scalar agg final gather",
    "disjunctive_brand_revenue": "scalar agg final gather",
    "tfidf_exact_features": "broadcast scalar n_docs count gather",
    "unigram_logprob_scores": "broadcast scalar corpus-total gather",
    "bigram_logprob_scores": "broadcast scalar vocab-count gather — same shape as unigram_logprob_scores' corpus total",
    "trigram_logprob_scores": "broadcast scalar (n_corpus, v) gather — same shape as bigram_logprob_scores' vocab count",
    "zorder_key_probe": "broadcast per-column (min,max) bounds gather (one row) — the coordinate-scaling scalars, same shape as unigram_logprob_scores' corpus total",
    "bloom_decontaminate_overlap": "bitmap densify gather: one ordered collect_list row of <= m_bits/64 words (PARAMETER-bounded, never data-bounded — the bit_or partial agg reduced each partition first), broadcast back as the Bloom filter",
    "dsir_importance_weights": "broadcast scalar totals gather (one row: r_total/t_total/vocab) — same shape as unigram_logprob_scores",
    "dsir_select_topk": "same broadcast scalar totals gather as dsir_importance_weights (selection is TakeOrderedAndProject, no global sort exchange)",
    "dsir_select_fraction": "totals gather (as dsir_importance_weights) + one-row percentile-threshold gather broadcast back; the EXACT percentile buffer is the conformance form — approx=True (percentile_approx, mergeable t-digest buffers) is the corpus-scale swap",
    "small_quantity_revenue": "scalar agg final gather",
    "money_scale_contract": "scalar agg final gather (5 counters)",
    "events_key_skew_report": "scalar agg over per-key counts gather",
    # windows over PRE-AGGREGATED day-grain frames (~1 row/day): documented
    # safe — the fact table was reduced by groupBy(day) before the window
    "window_daily_diff": "post-agg daily window (~30 rows)",
    "moving_avg_7day": "post-agg daily window (~30 rows)",
    "cumulative_daily_revenue": "post-agg daily window (~1 row/day)",
    # normalizing windows over the PER-SOURCE mixture table (|sources|
    # rows of three numerics — the corpus was reduced by groupBy(source)
    # first; even a 10^7-domain web-crawl mixture is one small task)
    "mixture_weights_by_source": "post-agg per-source mixture window",
}


def test_no_unjustified_single_partition_exchanges(spark, sf_dir):
    flagged = {}
    for name, fn in q.queries().items():
        hits = single_partition_exchanges(fn(spark, sf_dir))
        if hits and name not in WHITELIST:
            flagged[name] = hits[0]
    assert flagged == {}, (
        "queries moving data to a single partition without a whitelist "
        f"justification: {flagged}"
    )


def test_whitelist_is_not_stale(spark, sf_dir):
    """Every whitelisted query must still exist and still have the exchange
    (otherwise the entry is dead and should be removed)."""
    registry = q.queries()
    stale = []
    for name in WHITELIST:
        if name not in registry:
            stale.append(f"{name}: not in registry")
            continue
        if not single_partition_exchanges(registry[name](spark, sf_dir)):
            stale.append(f"{name}: no single-partition exchange anymore")
    assert stale == [], stale

"""Measure the answer-preserving skew split in its DESIGN regime
(VERDICT r04 "Next round" #3): a corpus with ONE boilerplate text
duplicated m times on top of the sf1 documents background, so each simhash
chunk has a single hot bucket of m rows whose C(m,2) pair emission lands
on one task under the plain self-join.

Timed side: simhash_near_duplicates(...) reduced to (pair_count,
checksum) — a count + order-independent xxhash64 sum, so the pair set is
value-compared between the plain and salted runs without collecting the
quadratic pair list.

Scale honesty: at m true duplicates the VERIFIED OUTPUT is C(m,2) pairs —
quadratic in m by definition of the answer, not an artifact of the join
strategy. m = 10^5 identical docs means 5x10^9 result rows (~200 GB of
shuffle per chunk either way); no skew strategy makes that tractable, and
the correct pipeline move at that point is exact/canonical dedup FIRST
(curation_funnel stage 1) so near-dup only ever sees one representative
per identical text. The skew split's value is the regime between "plain
join straggles" and "the answer itself is too big": hot buckets of
10^3.5-10^4.5 rows. This script measures m = 10^4 (plain feasible) and
extrapolates the plain single-task emission quadratically; PERF.md and
the _salted_self_pairs docstring record the numbers.

Usage: python tools/measure_skew_split.py [sf_dir] [m] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.operators.dedup import (
    simhash_near_duplicates,
)
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata


def build_corpus(spark, sf_dir: str, m: int):
    base = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    boiler = (
        "subscribe to our newsletter terms of service privacy policy all "
        "rights reserved copyright twenty nineteen contact us about careers "
        "press blog help center community guidelines cookie settings"
    )
    dups = spark.range(m).select(
        (F.col("id") + F.lit(1_000_000_000)).alias("doc_id"),
        F.lit(boiler).alias("text"),
    )
    # Materialize to a temp parquet (NOT localCheckpoint: the inter-run
    # clearCache() drops localCheckpoint's backing blocks, which are
    # unrecoverable by design) so corpus construction is excluded from
    # timing and each run rebuilds its DataFrame from disk.
    path = os.path.join(".localdata", f"_skew_corpus_m{m}.parquet")
    base.unionByName(dups).write.mode("overwrite").parquet(path)
    return path


def timed(spark, corpus_path, skew_split_bucket_size, n_salt=8):
    t0 = time.time()
    out = simhash_near_duplicates(
        spark.read.parquet(corpus_path),
        "text",
        "doc_id",
        max_hamming=3,
        chunks=4,
        # NOT eager_release: that localCheckpoints the full C(m,2) pair
        # list into block storage (OOM at m=3x10^4 even on a 32g heap).
        # The (count, checksum) aggregate consumes pairs streaming; the
        # chunk cache is dropped by the inter-run clearCache() instead.
        eager_release=False,
        skew_split_bucket_size=skew_split_bucket_size,
        n_salt=n_salt,
    )
    row = out.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(
            F.xxhash64(F.col("id_a"), F.col("id_b"), F.col("hamming"))
        ).alias("checksum"),
    ).collect()[0]
    return time.time() - t0, int(row.pairs), int(row.checksum)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("skew-split-measure")
    corpus_path = build_corpus(spark, sf_dir, m)

    results = {"sf_dir": sf_dir, "m": m}
    for label, thresh in [("plain", None), ("salted_8", 4096)]:
        best = None
        for _ in range(runs):
            sec, pairs, checksum = timed(spark, corpus_path, thresh)
            spark.catalog.clearCache()
            best = min(best, sec) if best is not None else sec
        results[label] = {
            "min_sec": round(best, 2),
            "pairs": pairs,
            "checksum": checksum,
        }
        print(f"  {label}: {best:.1f}s pairs={pairs}", file=sys.stderr)
    results["answer_equal"] = (
        results["plain"]["pairs"] == results["salted_8"]["pairs"]
        and results["plain"]["checksum"] == results["salted_8"]["checksum"]
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()

"""Nightly ingest-time dedup on the engine — the incremental shapes a
production training-data pipeline actually runs (SURVEY.md §8, round-4
persisted-state API):

1. bootstrap: fingerprint the accepted corpus ONCE —
   - exact state: distinct canonical-md5 set (16 bytes/doc)
   - near-dup state: simhash banding (id, fp, chunk, cv) via
     ``simhash_banding_state`` — both written as parquet model state
2. per batch:
   0. intra-batch dedup: exact (min-id representative per canonical
      fingerprint) + a batch-sized self near-dup pass — docs duplicated
      WITHIN one batch would otherwise all pass the state screen and
      seed duplicate state
   a. exact screen: ``screen_exact_duplicates`` probes the batch against
      the exact state (text never shuffles — both sides reduce to
      (id, fp) before the join)
   b. near-dup probe: ``incremental_near_duplicates(corpus_banded=state)``
      — the corpus is NEVER re-scanned or re-fingerprinted; the batch's
      banded fingerprints equi-join the persisted banding
   c. accept the survivors, append their fingerprints/banding to the
      state stores (the only writes are batch-sized)

At 100 TB the state stores are the only corpus-sized artifacts, written
once and appended to; each nightly run costs O(batch) + one probe join.

Usage: python examples/incremental_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.operators.dedup import (
    incremental_near_duplicates,
    normalize_text,
    screen_exact_duplicates,
    simhash_banding_state,
    simhash_near_duplicates,
)
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental-ingest-example")
    state_dir = tempfile.mkdtemp(prefix="ingest_state_")
    exact_state = os.path.join(state_dir, "exact_fp")
    band_state = os.path.join(state_dir, "simhash_banding")

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    # corpus = docs with doc_id % 3 != 0; two "nightly" batches from the rest
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    batches = [
        docs.where((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == 0)),
        docs.where((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == 1)),
    ]

    # ---- bootstrap: corpus-sized work happens exactly once ----
    corpus.select(
        F.md5(normalize_text("text")).alias("fp")
    ).distinct().write.mode("overwrite").parquet(exact_state)
    simhash_banding_state(corpus, "text", "doc_id").write.mode(
        "overwrite"
    ).parquet(band_state)

    try:
        for i, batch in enumerate(batches, 1):
            # ---- intra-batch dedup (ADVICE r04): two identical/near-dup
            # docs arriving in the SAME nightly batch would each pass the
            # state screen (the state predates both) and both seed
            # duplicate state. Exact: keep the min-doc_id representative
            # per canonical fingerprint; near: a batch-sized self
            # near-dup pass, dropping the higher id of each pair. Both
            # are O(batch).
            #
            # Near-dup semantics (ADVICE r05): dropping every id_b of
            # every pair collapses duplicate CHAINS to their minimum id —
            # connected-component semantics, not pairwise-maximal: a doc
            # can be removed because it was near-dup of another REMOVED
            # doc while itself exceeding max_hamming from the kept
            # representative. That is the intended posture here (a chain
            # of borderline-similar docs is one cluster; keep one), and
            # it matches the batch-level curation funnel. If pairwise-only
            # dropping (a maximal independent set) is required, compute
            # components explicitly and pick representatives per component
            # — see operators.dedup.connected_components.
            n_raw = batch.count()
            reps = (
                batch.select(
                    "doc_id", F.md5(normalize_text("text")).alias("fp")
                )
                .groupBy("fp")
                .agg(F.min("doc_id").alias("doc_id"))
                .select("doc_id")
            )
            batch = batch.join(reps, "doc_id", "left_semi")
            intra_losers = (
                simhash_near_duplicates(
                    batch, "text", "doc_id", max_hamming=3, chunks=4
                )
                .select(F.col("id_b").alias("doc_id"))
                .distinct()
            )
            batch = batch.join(intra_losers, "doc_id", "left_anti")

            state_fp = spark.read.parquet(exact_state)
            # exact screen against the persisted fingerprint set: reuse
            # screen_exact_duplicates' join by presenting the state as a
            # (text-free) corpus stand-in via a direct probe join
            probe = batch.select(
                "doc_id", F.md5(normalize_text("text")).alias("fp")
            )
            flagged = probe.join(
                state_fp.withColumn("_dup", F.lit(True)), "fp", "left"
            ).select(
                "doc_id",
                F.coalesce("_dup", F.lit(False)).alias("is_exact_dup"),
            )
            survivors = batch.join(
                flagged.where(~F.col("is_exact_dup")).select("doc_id"),
                "doc_id",
                "left_semi",
            )

            near = incremental_near_duplicates(
                survivors,
                None,  # corpus never touched: probe the persisted banding
                "text",
                "doc_id",
                max_hamming=3,
                chunks=4,
                corpus_banded=spark.read.parquet(band_state),
            )
            near_ids = near.select(
                F.col("new_id").alias("doc_id")
            ).distinct()
            accepted = survivors.join(near_ids, "doc_id", "left_anti")

            n_batch = batch.count()
            n_exact = n_batch - survivors.count()
            n_accept = accepted.count()
            print(
                f"batch {i}: {n_raw} docs, {n_raw - n_batch} intra-batch "
                f"dups, {n_exact} exact dups vs state, "
                f"{survivors.count() - n_accept} near dups vs state, "
                f"{n_accept} accepted"
            )

            # append ONLY the accepted batch's state (batch-sized writes)
            accepted.select(
                F.md5(normalize_text("text")).alias("fp")
            ).distinct().write.mode("append").parquet(exact_state)
            simhash_banding_state(accepted, "text", "doc_id").write.mode(
                "append"
            ).parquet(band_state)
        print("state stores:", state_dir)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

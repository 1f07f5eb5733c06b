"""Training-corpus export on the ACID table — the r12 surfaces composed
the way a data team runs its nightly export + compliance lifecycle:

1. learn a BPE merge table from the corpus (bounded driver state via the
   word-type cap) and encode per-doc token counts + streams
2. pack documents into token-budget bins (budgeted in LEARNED tokens)
   and assign deterministic md5 shards
3. land the export in a ManifestTable shard-by-shard with exactly-once
   (app_id, batch_id) watermarks — a replayed shard is a no-op
4. OPTIMIZE ZORDER the committed snapshot on (lang, bin) so file stats
   prune on both columns
5. right-to-be-forgotten: DELETE one source's documents — the stats-
   pruned copy-on-write rewrites only the files holding matches
6. consume the change feed (changes_between) downstream — exactly the
   deleted keys, read from O(delta) files
7. audit with history(); demonstrate restore(version) rolling the
   delete back atomically (then re-apply it, as a real incident
   response would after a bad delete)

Every heavy stage is a DataFrame transformation; the driver holds only
the merge table (capped) and the manifest file listing.

Usage: python examples/training_export_acid.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.operators.bpe import (
    bpe_encode_counts,
    train_bpe_merges,
)
from aim357_2019_etl_and_ml_workshop_spark.operators.mlpipeline import (
    pack_sequences,
    shard_assign,
)
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from aim357_2019_etl_and_ml_workshop_spark.sources.manifest import ManifestTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-export-acid")
    report: list[tuple[str, object]] = []

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    report.append(("input docs", docs.count()))

    # 1. learned tokenizer: merge table + per-doc counts in that unit
    merges = train_bpe_merges(docs, "text", n_merges=64,
                              max_word_types=100_000)
    counts = bpe_encode_counts(docs, merges, "text", "doc_id")
    report.append(("bpe merges learned", len(merges)))

    # 2. pack in learned-token budgets, shard deterministically
    packed = pack_sequences(
        docs.join(counts, "doc_id"), "doc_id", "text", "lang",
        budget_tokens=512, n_tok_col="n_bpe",
    )
    items = shard_assign(
        docs.join(packed.select("doc_id", "bin", "n_tok"), "doc_id"),
        "doc_id", 4,
    ).select("doc_id", "lang", "source", "shard", "bin", "n_tok", "text")
    report.append(("packing bins", packed.select("lang", "bin").distinct().count()))

    root = tempfile.mkdtemp(prefix="export_tbl_")
    try:
        table = ManifestTable.create(spark, root)
        # 3. exactly-once shard landing: batch_id = shard
        for shard in range(4):
            table.append(
                items.where(F.col("shard") == shard),
                app_id="export", batch_id=shard,
            )
        # a replayed shard (crash-recovery rerun) is a no-op
        replay = table.append(
            items.where(F.col("shard") == 0), app_id="export", batch_id=0
        )
        report.append(("replayed shard committed", replay))
        report.append(("rows landed", table.read().count()))

        # 4. OPTIMIZE ZORDER on the consumption/retention columns
        table.compact(
            target_file_bytes=max(
                1,
                sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in table._load(table.latest_version())["files"]
                )
                // 8,
            ),
            zorder_by=["doc_id", "bin"],
            zorder_bits=8,
            zorder_mapping="rank",
        )

        # 4b. retention-window delete on a LAYOUT column: the z-order
        # stats admit the predicate for only a few files, so the
        # copy-on-write rewrite is stats-pruned
        ret = table.delete("doc_id < 50")
        report.append(("retention delete rows", ret["rows_deleted"]))
        report.append(
            (
                "retention files rewritten / total",
                f"{ret['files_rewritten']}/{ret['files_total']}",
            )
        )
        v_clean = table.latest_version()

        # 5. right-to-be-forgotten: drop one source entirely. The
        # predicate column is NOT in the layout, so expect a near-full
        # rewrite — the honest cost of a layout-unaligned delete (align
        # the z-order with your compliance keys if these dominate)
        stats = table.delete("source = 'src7'")
        report.append(("rows deleted (src7)", stats["rows_deleted"]))
        report.append(
            (
                "src-delete files rewritten / total",
                f"{stats['files_rewritten']}/{stats['files_total']}",
            )
        )

        # 6. downstream incremental consumption: the change feed
        feed = table.changes_between(v_clean, table.latest_version(), ["doc_id"])
        feed_counts = {
            r["change_type"]: r["count"]
            for r in feed.groupBy("change_type").count().collect()
        }
        report.append(("change feed", feed_counts))

        # 7. audit + incident response: roll the delete back, then
        # re-apply it deliberately
        v_restored = table.restore(v_clean)
        report.append(("rows after restore", table.read().count()))
        table.delete("source = 'src7'")
        report.append(("rows after re-delete", table.read().count()))
        report.append(
            ("versions in history", len(table.history()))
        )
        assert v_restored == table.latest_version() - 1
    finally:
        shutil.rmtree(root, ignore_errors=True)

    width = max(len(k) for k, _ in report)
    for k, v in report:
        print(f"{k:<{width}} {v!s:>24}")


if __name__ == "__main__":
    main()

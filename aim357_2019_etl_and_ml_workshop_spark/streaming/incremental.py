"""Incremental ingest — the Glue job-bookmark equivalent (SURVEY.md S13).

The reference's nightly ETL re-runs process only files added since the last
``job.commit()`` (transformation_ctx bookmarks, yellow.py:17,28-52,53).
Spark-native equivalent: a file-source stream with
``trigger(availableNow=True)`` + checkpoint — each invocation processes
exactly the files not yet recorded in the checkpoint, then terminates.
Exactly-once at file granularity, crash-safe, no manifest bookkeeping of
our own.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class IncrementalIngest:
    """One bookmarked pipeline: input dir -> transform -> parquet sink.

    Each ``run_once()`` is one 'nightly job': it picks up only new files
    (checkpoint = bookmark), applies ``transform``, appends to the sink,
    and returns after the backlog drains (availableNow trigger)."""

    def __init__(
        self,
        spark: SparkSession,
        input_path: str,
        schema: StructType | str,
        output_path: str,
        checkpoint_path: str,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        fmt: str = "parquet",
        max_files_per_trigger: int | None = None,
    ) -> None:
        self.spark = spark
        self.input_path = input_path
        self.schema = schema
        self.output_path = output_path
        self.checkpoint_path = checkpoint_path
        self.transform = transform or (lambda df: df)
        self.fmt = fmt
        # Backlog pacing: after an outage, availableNow drains EVERYTHING
        # pending; on a 100TB table that one catch-up batch can exceed
        # executor memory. maxFilesPerTrigger splits the drain into bounded
        # micro-batches (availableNow still terminates when caught up).
        self.max_files_per_trigger = max_files_per_trigger

    def run_once(self, timeout_sec: float = 300.0) -> None:
        reader = (
            self.spark.readStream.format(self.fmt)
            .schema(self.schema)
        )
        if self.max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", self.max_files_per_trigger
            )
        src = reader.load(self.input_path)
        out = self.transform(src)
        q = (
            out.writeStream.format("parquet")
            .option("path", self.output_path)
            .option("checkpointLocation", self.checkpoint_path)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError("incremental ingest did not drain in time")


class IncrementalAggregate:
    """Incrementally-maintained keyed additive aggregate (count/sum) — the
    continuous-rollup companion to IncrementalIngest: each ``run_once()``
    drains only new files (checkpoint bookmark) and lands that micro-batch's
    PARTIAL aggregate under ``batch_id=<n>``; the read path merges partials
    with one groupBy. Exactly-once without transactions: a replayed batch
    overwrites ITS OWN partition (idempotent), never double-counts — the
    same per-batch-partition idempotency pattern as
    foreach_batch_parquet_sink. Compaction (optional, any time) just
    rewrites all partials into one partition; readers are unaffected
    because merge is associative."""

    def __init__(
        self,
        spark: SparkSession,
        input_path: str,
        schema: StructType | str,
        state_path: str,
        checkpoint_path: str,
        key_cols: list[str],
        sum_cols: dict[str, str],
        fmt: str = "parquet",
        max_files_per_trigger: int | None = None,
    ) -> None:
        self.spark = spark
        self.input_path = input_path
        self.schema = schema
        self.state_path = state_path
        self.checkpoint_path = checkpoint_path
        self.key_cols = key_cols
        self.sum_cols = dict(sum_cols)  # out_name -> input expr/col
        self.fmt = fmt
        # same backlog pacing rationale as IncrementalIngest
        self.max_files_per_trigger = max_files_per_trigger

    def _write_partial(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        partial = batch_df.groupBy(*self.key_cols).agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum(F.expr(src)).alias(out)
                for out, src in self.sum_cols.items()
            ],
        )
        (
            partial.write.mode("overwrite").parquet(
                f"{self.state_path}/batch_id={int(batch_id)}"
            )
        )

    def run_once(self, timeout_sec: float = 300.0) -> None:
        reader = (
            self.spark.readStream.format(self.fmt)
            .schema(self.schema)
        )
        if self.max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", self.max_files_per_trigger
            )
        src = reader.load(self.input_path)
        q = (
            src.writeStream.foreachBatch(self._write_partial)
            .option("checkpointLocation", self.checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_sec)
        finally:
            if q.isActive:
                q.stop()

    def read(self) -> DataFrame:
        from pyspark.sql import functions as F

        partials = self.spark.read.parquet(self.state_path)
        return partials.groupBy(*self.key_cols).agg(
            F.sum("_n").alias("n"),
            *[F.sum(out).alias(out) for out in self.sum_cols],
        )

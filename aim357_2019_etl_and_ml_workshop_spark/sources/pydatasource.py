"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic-corpus generator, registered as format("fakecorpus").

Why this exists: the reference ingests from managed services; a standalone
engine needs a first-class way to plug NEW sources in without JVM code.
Spark 4's Python DataSource API is that extension point — schema,
partition planning, and per-partition iterators all declared in Python,
executed in parallel across the cluster (one task per InputPartition).

The generator is seedless-deterministic (content derived from md5 of the
row id), so tests and oracles can recompute every row; partitioning is
range-based over the id space, so reads scale out with no coordination.
Options: ``rows`` (total), ``partitions`` (parallelism).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = [
    "data", "spark", "table", "join", "scan", "hash", "merge", "sort",
    "batch", "stream", "column", "row", "filter", "agg", "shuffle", "plan",
]


def _doc_text(doc_id: int) -> str:
    """Deterministic pseudo-text: 12 words chosen by the md5 bytes of the
    id — reproducible anywhere (hashlib, not RNG state)."""
    h = hashlib.md5(str(doc_id).encode()).digest()
    return " ".join(_WORDS[b % len(_WORDS)] for b in h[:12])


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class FakeCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.rows // self.n_parts))  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, _doc_text(i), len(_doc_text(i)))


class FakeCorpusDataSource(DataSource):
    """format("fakecorpus"): deterministic synthetic documents."""

    @classmethod
    def name(cls) -> str:
        return "fakecorpus"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_chars int"

    def reader(self, schema) -> FakeCorpusReader:
        return FakeCorpusReader(self.options)


def register_fakecorpus(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(FakeCorpusDataSource)

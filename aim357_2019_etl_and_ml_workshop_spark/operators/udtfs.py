"""Python UDTFs (user-defined TABLE functions) — the Spark-4 extension
seam for generator-shaped per-row logic (one input row -> many output
rows with imperative state), the table-valued analogue of the reference's
scalar UDF surface (GluePySparkMLFeatureEngineering.rst:510-520's
per-record transforms).

A UDTF runs partition-local inside a Generate node: no shuffle, no
driver involvement, linear scale-out — the right seam for custom parsers,
tokenizers, and decoders that built-in generators (explode/posexplode/
inline) can't express. Arrow transfer (useArrow=True) batches rows
through Python, avoiding per-row pickling.

The rule from the repo's UDF policy still applies: anything expressible
with built-in functions should use them (see textanalysis.py /
chunk_tokens for the built-in chunker). `WordRuns` below is deliberately
a STATEFUL generator — run-length encoding needs sequential state per
document, which `explode` alone cannot carry — so it demonstrates the
seam on logic that genuinely wants imperative code, while remaining
SQL-checkable via a gaps-and-islands rewrite (see queries.word_runs_udtf
for the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="run_idx: int, word: string, run_len: int", useArrow=True)
class WordRuns:
    """Run-length-encode the word sequence of one document: each yielded
    row is a maximal run of a repeated word with its ordinal position.
    Stateful per input row, stateless across rows — safe to parallelize
    per-partition."""

    def eval(self, text: str):  # noqa: D102 — contract documented above
        if text is None:
            return
        run_idx = 0
        prev: str | None = None
        run_len = 0
        for word in text.split(" "):
            if word == prev:
                run_len += 1
                continue
            if prev is not None:
                yield run_idx, prev, run_len
                run_idx += 1
            prev = word
            run_len = 1
        if prev is not None:
            yield run_idx, prev, run_len


def register_udtfs(spark) -> None:
    """Idempotently register the UDTF surface on a session (re-registering
    the same name is a cheap overwrite, not a leak)."""
    spark.udtf.register("word_runs", WordRuns)

"""Scalar function surface (SURVEY.md §2.8, F1-F14).

Thin, documented wrappers over pyspark.sql.functions — everything stays
JVM-side inside whole-stage codegen; no Python UDFs here. Each maps to a
specific reference usage (file:line in docstrings).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType


def day_trunc(ts: Column | str) -> Column:
    """F1: date_trunc('day', ts) (DataDiscoveryAndConversation.rst:319,636)."""
    return F.date_trunc("day", ts)


def ts_from_string(c: Column | str, fmt: str | None = None) -> Column:
    """F3/F4: string -> timestamp; unparseable -> NULL. Explicit-format
    variant matches to_timestamp(c, 'yyyy-MM-dd HH:mm:ss')
    (GluePySparkMLFeatureEngineering.rst:447-448)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.to_timestamp(col, fmt) if fmt else col.cast("timestamp")


def ts_literal(s: str) -> Column:
    """F5: literal timestamp bound built like the reference's
    to_date(lit(s)).cast(TimestampType()) (.rst:132-133)."""
    return F.to_date(F.lit(s)).cast(TimestampType())


def epoch_to_ts(c: Column | str) -> Column:
    """F6: epoch seconds -> timestamp (.rst:177)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp")


def like_prefix(c: Column | str, prefix: str) -> Column:
    """F8/P8: string prefix predicate, LIKE 'x%'
    (DataDiscoveryAndConversation.rst:454)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.like(prefix + "%")


def series_jsonline(start: Column, target: Column, cat: Column | None = None) -> Column:
    """F13: one DeepAR JSON Lines object per series —
    {"start": "...", "target": [...]} (+"cat") matching series_to_obj /
    series_to_jsonline (GluePySparkMLFeatureEngineering.rst:718-733)."""
    fields = [start.alias("start"), target.alias("target")]
    if cat is not None:
        fields.append(cat.alias("cat"))
    return F.to_json(F.struct(*fields))

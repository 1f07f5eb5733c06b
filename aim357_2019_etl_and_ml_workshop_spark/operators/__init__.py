from .canonicalize import (
    CANONICAL_SCHEMA,
    apply_mapping,
    canonicalize,
    drop_null_fields,
    quality_expectations,
    snapshot_diff,
    tag,
    try_cast_columns,
    upsert_snapshot,
)
from .timeseries import (
    counts_by_day,
    date_spine,
    epoch_day_bucket,
    pivot_by_type,
    resample_daily,
)

__all__ = [
    "CANONICAL_SCHEMA",
    "apply_mapping",
    "canonicalize",
    "drop_null_fields",
    "tag",
    "try_cast_columns",
    "counts_by_day",
    "date_spine",
    "epoch_day_bucket",
    "pivot_by_type",
    "resample_daily",
    "quality_expectations",
    "snapshot_diff",
    "upsert_snapshot",
]

# Discoverability re-exports for the beyond-reference operator families
from . import dedup, mlpipeline, multimodal, similarity, temporal_joins, textanalysis  # noqa: F401,E402

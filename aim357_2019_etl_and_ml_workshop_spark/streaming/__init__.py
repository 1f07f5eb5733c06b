from .windows import (
    dedup_stream,
    foreach_batch_parquet_sink,
    stream_from_directory,
    stream_stream_join,
    tumbling_counts,
)
from .incremental import IncrementalAggregate, IncrementalIngest
from .stateful import running_counts, running_stats, sessionize_stream

__all__ = [
    "dedup_stream",
    "foreach_batch_parquet_sink",
    "stream_from_directory",
    "stream_stream_join",
    "tumbling_counts",
    "IncrementalIngest",
    "IncrementalAggregate",
    "running_counts",
    "running_stats",
    "sessionize_stream",
]

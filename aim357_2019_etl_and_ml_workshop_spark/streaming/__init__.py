from .windows import (
    dedup_stream,
    stream_from_directory,
    stream_stream_join,
    tumbling_counts,
)
from .incremental import IncrementalIngest

__all__ = [
    "dedup_stream",
    "stream_from_directory",
    "stream_stream_join",
    "tumbling_counts",
    "IncrementalIngest",
]

from .windows import stream_from_directory, tumbling_counts
from .incremental import IncrementalIngest

__all__ = ["stream_from_directory", "tumbling_counts", "IncrementalIngest"]

from .windows import run_tumbling_count_stream
from .split_stream import run_split_stream

__all__ = ["run_tumbling_count_stream", "run_split_stream"]

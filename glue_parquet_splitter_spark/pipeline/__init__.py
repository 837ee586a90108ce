from .splitter import split_day, write_partitioned
from .incremental import run_incremental, list_files, extract_dates

__all__ = ["split_day", "write_partitioned", "run_incremental",
           "list_files", "extract_dates"]

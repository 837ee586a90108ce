from .compact import compact_dataset, count_data_files
from .incremental import extract_dates, list_files, run_incremental
from .splitter import split_day, write_partitioned

__all__ = ["split_day", "write_partitioned", "run_incremental",
           "list_files", "extract_dates", "compact_dataset",
           "count_data_files"]

from .cleaning import (
    dedup_keep_last,
    drop_nulls,
    null_ratio_prune,
    positional_skip_frac,
    positional_split,
    time_range_filter,
)
from .gapfill import fill_missing_time_idx
from .knn import knn_bruteforce, knn_lsh
from .resample import resample_ohlcv
from .timeframe import infer_timeframe, lag_deltas
from .windows import sliding_windows

__all__ = [
    "dedup_keep_last",
    "drop_nulls",
    "fill_missing_time_idx",
    "infer_timeframe",
    "knn_bruteforce",
    "knn_lsh",
    "lag_deltas",
    "null_ratio_prune",
    "positional_skip_frac",
    "positional_split",
    "resample_ohlcv",
    "sliding_windows",
    "time_range_filter",
]

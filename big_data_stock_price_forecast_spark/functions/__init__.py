from .calendar import add_calendar, add_time_idx, time_idx_col, weekday_mon0
from .distance import cos_sim, dist_l1, dist_l2, dist_l2sq, dot, l2_norm, weighted_dist
from .normalize import zscore_array, zscore_inverse_array

__all__ = [
    "add_calendar",
    "add_time_idx",
    "cos_sim",
    "dist_l1",
    "dist_l2",
    "dist_l2sq",
    "dot",
    "l2_norm",
    "time_idx_col",
    "weekday_mon0",
    "weighted_dist",
    "zscore_array",
    "zscore_inverse_array",
]

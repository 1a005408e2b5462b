"""Calendar feature projections and the discrete time index.

Reference parity:
- ``add_calendar_features`` (core/data/preprocess.py:19-27): hour, day,
  dayofweek (pandas convention Mon=0..Sun=6 — Spark's ``dayofweek`` is
  Sun=1..Sat=7, remapped here), month, ISO week, year.
- ``add_time_idx`` (core/data/preprocess.py:39): integer index
  ``(datetime - 2000-01-01) / step`` — the 2000-01-01 epoch anchor and
  floor division are part of the numeric contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANCHOR = "2000-01-01 00:00:00"
ANCHOR_EPOCH = 946684800  # unix seconds of 2000-01-01T00:00:00Z


def weekday_mon0(ts: Column | str) -> Column:
    """pandas ``dt.dayofweek``: Monday=0 .. Sunday=6."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return (F.dayofweek(ts) + F.lit(5)) % F.lit(7)


def add_calendar(df: DataFrame, ts_col: str = "datetime") -> DataFrame:
    ts = F.col(ts_col)
    return df.withColumns(
        {
            "hour": F.hour(ts),
            "day": F.dayofmonth(ts),
            "dayofweek": weekday_mon0(ts),
            "month": F.month(ts),
            "week": F.weekofyear(ts),
            "year": F.year(ts),
        }
    )


def time_idx_col(ts: Column | str, step_seconds: int = 3600) -> Column:
    """Hours (or ``step_seconds`` units) since 2000-01-01 UTC, floored."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.floor(
        (F.unix_timestamp(ts) - F.lit(ANCHOR_EPOCH)) / F.lit(step_seconds)
    ).cast("long")


def add_time_idx(
    df: DataFrame, ts_col: str = "datetime", step_seconds: int = 3600
) -> DataFrame:
    return df.withColumn("time_idx", time_idx_col(ts_col, step_seconds))


# F1 (core/data/utils.py:7-22): "<count><unit>" timeframe strings with
# units m/h/d/w/M/y. Calendar units (M, y) have no fixed second length;
# the reference approximates M=30d and y=365d — reproduced exactly.
_TIMEFRAME_UNIT_SECONDS = {
    "m": 60,
    "h": 3600,
    "d": 86400,
    "w": 7 * 86400,
    "M": 30 * 86400,
    "y": 365 * 86400,
}


def parse_timeframe(timeframe: str) -> int:
    """``"1h" -> 3600``: regex ``([0-9]+)([a-zA-Z])``, case-sensitive
    unit (m=minute, M=month). Raises on anything else — the reference's
    timeframe validation surface (S2) for arbitrary exchanges."""
    import re

    m = re.fullmatch(r"([0-9]+)([a-zA-Z])", timeframe)
    if not m or m.group(2) not in _TIMEFRAME_UNIT_SECONDS:
        raise ValueError(f"unparseable timeframe {timeframe!r}")
    return int(m.group(1)) * _TIMEFRAME_UNIT_SECONDS[m.group(2)]

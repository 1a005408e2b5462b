from .ops import (
    attribution_state_stream,
    cusum_state_stream,
    dedup_ingest_stream,
    distinct_keys_stream,
    ema_state_stream,
    garch_state_stream,
    interval_join_stream,
    resample_stream,
    run_available_now,
    session_stream,
    sliding_count_stream,
    stream_events,
)

__all__ = [
    "attribution_state_stream",
    "cusum_state_stream",
    "dedup_ingest_stream",
    "distinct_keys_stream",
    "ema_state_stream",
    "garch_state_stream",
    "interval_join_stream",
    "resample_stream",
    "run_available_now",
    "session_stream",
    "sliding_count_stream",
    "stream_events",
]

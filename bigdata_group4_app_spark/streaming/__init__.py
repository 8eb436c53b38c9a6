from .stateful import running_user_totals
from .windows import (
    attribution_stream_join,
    event_sessions,
    hourly_counts_stream,
    session_counts_stream,
    sliding_counts_stream,
    stream_events,
)

__all__ = [
    "attribution_stream_join",
    "event_sessions",
    "hourly_counts_stream",
    "running_user_totals",
    "session_counts_stream",
    "sliding_counts_stream",
    "stream_events",
]

from .windows import (  # noqa: F401
    read_event_stream,
    tumbling_agg,
    sliding_agg,
    session_agg,
    dedup_stream,
    run_available_now,
)

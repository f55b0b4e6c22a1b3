"""Structured Streaming surface (the reference has no streams — its
"streaming" is OS pipes; this module is north-star surface)."""

from .documents import (  # noqa: F401
    build_history_index,
    build_minhash_history,
    incremental_dedup_stream,
    minhash_flag_batch,
    minhash_neardup_stream,
    read_documents_stream,
)
from .sinks import (  # noqa: F401
    cms_sketch_batch,
    cms_sketch_stream,
    read_cms_sketch,
    read_sprt_monitor,
    sprt_monitor_stream,
    sprt_partial_batch,
    upsert_batch,
    upsert_events_stream,
)
from .events import (  # noqa: F401
    dedup_events_stream,
    dynamic_session_stream,
    hourly_rollup_stream,
    read_events_stream,
    purchase_click_join_stream,
    purchase_click_left_join_stream,
    rolling_distinct_stream,
    run_stream_to_memory,
    sessionize_stream,
    sliding_rollup_stream,
    user_value_stats_stream,
    user_value_stats_stream_v2,
)

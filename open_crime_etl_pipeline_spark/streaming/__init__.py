from .pipeline import (  # noqa: F401
    foreach_batch_upsert,
    sessionize_stateful,
    sessionize_transform_with_state,
    session_event_counts,
    stream_crime_pages,
    stream_events,
    streaming_dedup,
    transform_with_state_available,
    windowed_event_counts,
)

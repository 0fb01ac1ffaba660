from featureengineer_spark.streaming.sessions import (  # noqa: F401
    compact_band_store,
    stream_asof_attach,
    stream_dedup_exact,
    stream_dedup_neardup,
    stream_render_sessions,
    stream_running_profile,
    stream_session_stats,
    stream_sessionize_to_sink,
    stream_sliding_activity,
    stream_stream_asof,
)

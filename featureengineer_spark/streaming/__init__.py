from featureengineer_spark.streaming.sessions import (  # noqa: F401
    stream_session_stats,
    stream_sessionize_to_sink,
)

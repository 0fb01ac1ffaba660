from featureengineer_spark.data.synth import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    synth_anchors_pandas,
    synth_transcripts_pandas,
    synth_transcripts_spark,
)

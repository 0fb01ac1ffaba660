from featureengineer_spark.sources.io import (  # noqa: F401
    compact_small_files,
    read_csv_spine,
    read_transcripts,
    write_transcripts_partitioned,
)

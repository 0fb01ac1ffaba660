from featureengineer_spark.plans.pipeline import (  # noqa: F401
    FeaturePipeline,
    StageManifest,
    read_manifest,
)

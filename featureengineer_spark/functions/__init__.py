"""Scalar column helpers shared across operators."""

from featureengineer_spark.functions.scalars import epoch_micros, epoch_seconds  # noqa: F401

"""Scalar column functions.

Timestamp arithmetic is done in integer microseconds then scaled —
casting each timestamp to double first loses ~1e-7 s at 2024-epoch
magnitudes, which breaks exact parity with the pandas oracle and can
flip gap-threshold comparisons at session boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since epoch; tolerant of TIMESTAMP_NTZ inputs (the
    session time zone is pinned to UTC by ``get_spark``, so the NTZ →
    LTZ cast is the identity)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_seconds(col: Column | str) -> Column:
    return epoch_micros(col) / 1e6

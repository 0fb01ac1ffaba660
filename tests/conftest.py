from __future__ import annotations

import pandas as pd
import pytest

from featureengineer_spark import get_spark
from featureengineer_spark.data import synth_anchors_pandas, synth_transcripts_pandas


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="fe-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf() -> pd.DataFrame:
    return synth_transcripts_pandas(n_convs=40, seed=7, mega=1, mega_len=600)


@pytest.fixture(scope="session")
def anchors_pdf(transcripts_pdf) -> pd.DataFrame:
    return synth_anchors_pandas(transcripts_pdf, seed=11, per_conv=3)


@pytest.fixture(scope="session")
def transcripts(spark, transcripts_pdf):
    from featureengineer_spark.data import TRANSCRIPT_SCHEMA

    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    df = df.repartition(8, "conv_id").cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def anchors(spark, anchors_pdf):
    return spark.createDataFrame(anchors_pdf).cache()

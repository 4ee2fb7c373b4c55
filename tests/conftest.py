import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from file_deduplicator_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fds_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def clips_fixture():
    from file_deduplicator_spark.datagen import generate_clips

    return generate_clips(n_clips=120, seed=42)


@pytest.fixture(scope="session")
def clips_df(spark, clips_fixture):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("sr_hz", T.IntegerType()),
            T.StructField("dur_ms", T.IntegerType()),
            T.StructField("codec", T.StringType()),
            T.StructField("transcript", T.StringType()),
            T.StructField("mtime", T.TimestampType()),
            T.StructField("scenario", T.StringType()),
        ]
    )
    pdf = clips_fixture.clips.copy()
    pdf["bytes"] = pdf["bytes"].map(bytearray)
    return spark.createDataFrame(pdf, schema=schema).cache()

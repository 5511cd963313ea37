from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from vector_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vector-spark-tests", master="local[4]",
                  extra_confs={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts(spark):
    from vector_spark.transcripts import load_transcripts

    return load_transcripts(spark, SF).cache()


@pytest.fixture(scope="session")
def parsed(spark, transcripts):
    from vector_spark.functions import parse_transcripts

    return parse_transcripts(transcripts).cache()

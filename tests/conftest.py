from __future__ import annotations

import pytest

from kgpipe import schemas, synth
from kgpipe.session import get_spark

FIXTURE_CONVS = 120


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgpipe-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus():
    return synth.generate(n_convs=FIXTURE_CONVS)


@pytest.fixture(scope="session")
def transcripts_df(spark, corpus):
    return spark.createDataFrame(corpus.transcripts, schema=schemas.TRANSCRIPTS).cache()


@pytest.fixture(scope="session")
def entity_dict_df(spark, corpus):
    return spark.createDataFrame(corpus.entity_dict, schema=schemas.ENTITY_DICT).cache()

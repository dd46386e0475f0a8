from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", os.environ.get("SPARK_GRAFT_CPUS", "8"))


@pytest.fixture(scope="session")
def spark():
    from spikex_spark.session import get_spark

    s = get_spark(app_name="spikex_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_df(spark):
    from spikex_spark import synth

    return spark.createDataFrame(synth.gen_pages(120)).cache()


@pytest.fixture(scope="session")
def titles_df(spark):
    from spikex_spark import synth

    return spark.createDataFrame(synth.gen_titles()).cache()

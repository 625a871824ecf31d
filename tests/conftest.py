from __future__ import annotations

import pytest

from wikipath_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="wikipath_spark-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def edges_df(spark):
    def make(edge_list):
        return spark.createDataFrame([(int(a), int(b)) for a, b in edge_list], "src long, dst long")

    return make

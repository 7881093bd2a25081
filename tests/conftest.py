from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from knowledge_graph_system_spark.session import get_spark

    spark = get_spark("kg-spark-tests", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def ctx(spark):
    from knowledge_graph_system_spark.registry import Ctx

    return Ctx.get(spark, SF_DIR)

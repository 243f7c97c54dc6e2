import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from valico_spark.session import get_spark

    s = get_spark("valico_spark_tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "8",
                              "spark.driver.memory": "4g"})
    yield s


@pytest.fixture(scope="session")
def docs_df(spark):
    from valico_spark.sources.tables import load_docs

    return load_docs(spark, n_docs=3000, seed=42)


@pytest.fixture(scope="session")
def media_df(spark):
    from valico_spark.sources.tables import load_media_assets

    return load_media_assets(spark, n_docs=3000, seed=42)

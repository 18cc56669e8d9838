from __future__ import annotations

import tempfile

import pandas as pd
import pytest

from nil_spark.session import get_spark
from nil_spark.sources.transcripts import gen_queries, gen_transcripts


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running soak/scale tests")


@pytest.fixture(scope="session")
def spark():
    # warehouse + derby metastore in tmp so saveAsTable (bucketing
    # tests) never writes into the repo working dir
    wh = tempfile.mkdtemp(prefix="nil_spark_wh_")
    s = get_spark(
        app="nil_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        **{
            "spark.sql.warehouse.dir": wh,
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={wh}",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_1k() -> pd.DataFrame:
    return gen_transcripts(1000, seed=42)


@pytest.fixture(scope="session")
def queries_1k(transcripts_1k) -> pd.DataFrame:
    return gen_queries(transcripts_1k, n_queries=30, k=10, seed=43)

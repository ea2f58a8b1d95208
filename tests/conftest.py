import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webcrawler_spark import synth  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from webcrawler_spark.session import get_spark

    s = get_spark("webcrawler-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def web():
    """Small deterministic synthetic web shared by all tests."""
    return synth.generate_web(seed=42, n_hosts=12, n_pages=90)


@pytest.fixture(scope="session")
def web_dir(web, tmp_path_factory):
    d = tmp_path_factory.mktemp("synthweb")
    synth.write_parquet(web, str(d))
    return str(d)


@pytest.fixture(scope="session")
def pages_df(spark, web_dir):
    return spark.read.parquet(f"{web_dir}/pages.parquet")


@pytest.fixture(scope="session")
def seeds_df(spark, web_dir):
    return spark.read.parquet(f"{web_dir}/seeds.parquet")


@pytest.fixture(scope="session")
def robots_df(spark, web_dir):
    return spark.read.parquet(f"{web_dir}/robots.parquet")

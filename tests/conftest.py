import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def spark():
    from swiftlake_spark.config import EngineConfig
    from swiftlake_spark.session import build_session

    cfg = EngineConfig(app_name="swiftlake-tests", cpus=8, shuffle_partitions=8)
    s = build_session(cfg)
    yield s


@pytest.fixture()
def catalog(spark, tmp_path):
    from swiftlake_spark.tables.catalog import Catalog

    return Catalog(spark, str(tmp_path / "warehouse"))

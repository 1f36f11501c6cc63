from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from dend_spark_data_lake_spark.session import get_spark

    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _release_session_caches():
    """Release the bounded report/vocabulary frames registry queries keep
    cached (ADVICE r12): without this, every test that invokes a
    materialize-and-release adopter leaves one CacheManager entry for
    the life of the suite's shared session."""
    yield
    from dend_spark_data_lake_spark.queries import release_session_caches

    release_session_caches()

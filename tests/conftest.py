import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2streets_spark.session import get_spark  # noqa: E402
from osm2streets_spark.sources.fixtures import ensure_fixtures  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("osm2streets-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir():
    return ensure_fixtures("sf0.001")

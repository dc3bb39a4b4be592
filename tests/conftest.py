from __future__ import annotations

import pytest

from osm_render_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("osm_render_spark_tests", cpus=8, shuffle_partitions=8)
    yield s

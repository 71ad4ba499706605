from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from geo_linked_open_data_kg_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s

from __future__ import annotations

import pytest

from mpi_word_count_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8, driver_memory="8g")
    yield s
    s.stop()

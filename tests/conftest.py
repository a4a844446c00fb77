from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from doctr_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="doctr_spark_tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()

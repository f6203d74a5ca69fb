from __future__ import annotations

import pytest

import data_pipeline_childcare_spark as eng


@pytest.fixture(scope="session")
def spark():
    s = eng.get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()

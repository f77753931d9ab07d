import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.plans.session import build_session

    s = build_session(master="local[4]", app_name="ocr_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(scope="session")
def spark():
    from parquet_go_spark.spark.session import get_spark

    s = get_spark(app="pytest", cores=min(8, os.cpu_count() or 8), arrow_batch_rows=8192)
    yield s
    s.stop()

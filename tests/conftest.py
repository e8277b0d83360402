import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from imposm2_spark.session import get_spark

    s = get_spark(app_name="imposm2_spark_tests", master="local[4]", shuffle_partitions=8)
    # availableNow queries over stateful-timeout operators never self-
    # terminate with no-data microbatches on (streaming.stateful header);
    # without this every stream_dedup_* test burns its full awaitTermination
    # timeout (~12 min of dead wait across the suite, measured).
    from imposm2_spark.streaming.stateful import enable_drain_termination

    enable_drain_termination(s)
    yield s
    s.stop()

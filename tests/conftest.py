import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from intraarchivededuplicator_spark.session import get_spark

    s = get_spark(app="iad-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from connapse_spark.session import get_spark

    # one JVM serves the whole suite (~5k stages): cached fixtures,
    # broadcasts, and codegen survivors accumulate, and the r7 suite
    # crossed the 16g default mid-run (OOM in test_pq). 24g keeps
    # compressed oops (<32g) with ample headroom.
    s = get_spark(
        app_name="connapse-tests", cpus="4", shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "24g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ray_beam_runner_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # static conf: bucketed-table tests need a writable warehouse
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="rbrs_wh_"),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

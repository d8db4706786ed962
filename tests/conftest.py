import os

import pytest

from cdc_application_febuary_spark.compat.protobuf_compat import ensure_protobuf
from cdc_application_febuary_spark.session import get_spark

# Before any SparkSession exists: bridge google.protobuf (needed by
# transformWithStateInPandas) so the workers' PYTHONPATH includes it.
ensure_protobuf()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="cdc-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_flight_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # smaller local parallelism than the bench default: unit-test data is
    # tiny and task-launch overhead dominates
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("flight-etl-tests", cpus=int(os.environ["SPARK_GRAFT_CPUS"]))
    yield s

import pytest

from rsgislib_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master="local[4]",
                  **{"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()

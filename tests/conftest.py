import pytest

from sparkfp.session import get_spark


@pytest.fixture(scope="session")
def spark():
    sp = get_spark("sparkfp-tests", cores=8, shuffle_partitions=8)
    yield sp
    sp.stop()

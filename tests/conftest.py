import numpy as np
import pytest

from kiez_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kiez-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def source_target():
    """Mirror of the reference session fixture
    (/root/reference/tests/conftest.py:5-11): seed-42 RandomState,
    source drawn first (20x5), then target (50x5)."""
    rng = np.random.RandomState(42)
    source = rng.rand(20, 5)
    target = rng.rand(50, 5)
    return source, target


def to_vec_df(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "id bigint, vec array<double>")


@pytest.fixture(scope="session")
def source_df(spark, source_target):
    return to_vec_df(spark, source_target[0]).cache()


@pytest.fixture(scope="session")
def target_df(spark, source_target):
    return to_vec_df(spark, source_target[1]).cache()

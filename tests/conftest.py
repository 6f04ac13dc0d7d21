import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t_res_spark import datagen  # noqa: E402
from t_res_spark.session import get_spark  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_ROOT = os.path.join(REPO_ROOT, "data")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="t_res_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_fx():
    return datagen.generate(seed=42, **datagen.SCALES["tiny"])


@pytest.fixture(scope="session")
def tiny_dir(tiny_fx):
    return datagen.ensure_fixture("tiny", root=DATA_ROOT)


@pytest.fixture(scope="session")
def small_dir():
    return datagen.ensure_fixture("small", root=DATA_ROOT)

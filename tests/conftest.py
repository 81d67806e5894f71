from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webalizer_spark import get_spark  # noqa: E402
from webalizer_spark.datagen import GenParams, ensure_fixture  # noqa: E402

FIXTURE_BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_gen")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="webalizer_spark_tests", shuffle_partitions=8,
                  extra_confs={"spark.ui.showConsoleProgress": "false"})
    yield s


@pytest.fixture(scope="session")
def fixture_dir() -> str:
    return ensure_fixture(FIXTURE_BASE, GenParams())


@pytest.fixture(scope="session")
def small_fixture_dir() -> str:
    """Tiny fixture for exhaustive row-level assertions."""
    return ensure_fixture(
        FIXTURE_BASE, GenParams(n_convs=200, hot_convs=1, hot_mult=20),
        tag="sf_small")


@pytest.fixture(scope="session")
def transcripts(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/transcripts.parquet")


@pytest.fixture(scope="session")
def dims(spark, fixture_dir):
    return {n: spark.read.parquet(f"{fixture_dir}/{n}.parquet")
            for n in ["role_class", "tool_family", "byte_ranges",
                      "engine_params", "name_groups"]}

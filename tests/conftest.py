from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from spider_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spider_spark_tests", cpus=8)
    yield s


@pytest.fixture()
def tmp_store(tmp_path, spark):
    from spider_spark.storage.catalog import SnapshotStore

    return SnapshotStore(spark, str(tmp_path / "store"))

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from ocr_auto_label_spark.session import build_spark

    spark = build_spark(app_name="pytest", shuffle_partitions=8)
    yield spark
    spark.stop()

"""Shared fixtures, modeled on the reference's local-SparkSession
conftest (/root/reference/tests/conftest.py:59-71) plus Arrow + AQE."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        "lakehouse-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "8g",
            # keep test shuffles tiny; prod profile in session.py
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )
    yield spark


@pytest.fixture()
def table_root(tmp_path):
    return str(tmp_path / "clips_table")


@pytest.fixture(scope="session")
def clips_pdf_small():
    from lakehouse.synth import synth_clips_pdf

    return synth_clips_pdf(range(64), seed=42, n_days=4)

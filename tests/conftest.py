"""Shared fixtures.

Replicates the reference's seeded fixtures (packages/pprl_core/tests/
conftest.py: Random(727); 64-bit vectors drawn from one shared stream)
without bitarray, plus a session-scoped local SparkSession.
"""

import random

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng_factory():
    def _make():
        return random.Random(727)

    return _make


@pytest.fixture(scope="session")
def rng(rng_factory):
    return rng_factory()


@pytest.fixture(scope="session")
def bits_factory(rng):
    def _make():
        draws = [rng.random() for _ in range(64)]
        return np.array([d < 0.5 for d in draws], dtype=bool)

    return _make


def _build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[4]")
        .appName("pprl-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )


@pytest.fixture(scope="session")
def spark():
    session = _build_spark()
    yield session
    session.stop()

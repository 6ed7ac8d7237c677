from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catenae_kafka_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "gated: environment-gated integration — skips when the "
        "dependency (kafka jar / spark-avro jar / protobuf) is absent, "
        "runs the real path when present",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def ckpt_root(tmp_path_factory) -> str:
    """The ONE reliable-checkpoint root for the whole test session: the
    checkpoint dir is SparkContext-global and make_checkpointer refuses
    to redirect an already-active root (VERDICT r9), so every test that
    exercises storage-backed checkpointing must share this directory."""
    return str(tmp_path_factory.mktemp("reliable_ckpt"))


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE

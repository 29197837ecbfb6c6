"""Shared Spark fixture: one session for the whole pytest run.

local[4] with tiny shuffle parallelism — tests assert semantics on
hand-sized frames; scale behavior is exercised by bench.py / the driver.
"""

from __future__ import annotations

import os

import pytest

# Test-harness split sizing (see queries._ensure_conf) — gated here so
# production sessions keep Spark's default maxPartitionBytes.
os.environ.setdefault("RIB_TEST_SPLIT_MB", "16")

from research_index_backend_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rib-tests", cpus="4")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s

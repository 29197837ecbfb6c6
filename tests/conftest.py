"""Shared Spark fixture: one session for the whole pytest run.

local[4] with tiny shuffle parallelism — tests assert semantics on
hand-sized frames; scale behavior is exercised by bench.py / the driver.
"""

from __future__ import annotations

import pytest

from research_index_backend_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rib-tests", cpus="4")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s

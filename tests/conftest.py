from __future__ import annotations

import pytest

from opentelemetry_collector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("otel-collector-spark-tests", master="local[8]")
    yield s
    # keep session alive for the whole pytest run; stopping is flaky in CI

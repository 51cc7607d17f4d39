from __future__ import annotations

import pytest

from dedup_domains_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dedup-tests", parallelism=8, shuffle_partitions=8)
    yield s

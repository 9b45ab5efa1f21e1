import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.session import get_spark  # noqa: E402


def pytest_ignore_collect(collection_path, config):
    """Default-suite budget (VERDICT r11 item 5: `pytest tests/` must
    finish inside external harness timeouts). The 21 historical
    `test_round9*_queries.py` batch-pin files (~160 tests, ~5 min) are
    skipped by default — every query they pin also has a declared
    oracle covered by the FULL parity sweep — and run in the round-close
    gate (`scripts/round_end.sh` sets SPARK_GRAFT_FULL_PARITY=1, which
    also re-enables them here)."""
    if os.environ.get("SPARK_GRAFT_FULL_PARITY"):
        return None
    if collection_path.name.startswith("test_round9"):
        return True
    return None


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="simpletasks-data-spark-tests", shuffle_partitions=8)
    yield s

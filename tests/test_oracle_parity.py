"""Driver-style oracle parity for every catalog query that declares an
oracle, at sf0.001 (fast) — the same check the external harness runs at
sf0.01."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402
from oracle_harness import compare  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

CASES = sorted(set(Q.queries()) & set(Q.oracle_sql()))


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(spark, name):
    fn = Q.queries()[name]
    sql = Q.oracle_sql()[name]
    n = compare(spark, name, fn, sql, SF_DIR)
    assert n >= 0

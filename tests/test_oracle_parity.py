"""Driver-style oracle parity at sf0.001 — the same check the external
harness runs at sf0.01.

Default run (VERDICT r11 item 5: the full 337-query sweep pushed the
default suite past the driver's pytest timeout): the FIRST 50 queries in
catalog order. Catalog order is the ``_CHECK_FIRST`` rotation, so this
window always covers every query changed in the current round plus the
stalest rotation — the same sample the driver's correctness gate takes.

Full sweep (all ~337 oracle-declared queries) runs with
``SPARK_GRAFT_FULL_PARITY=1 python -m pytest tests/test_oracle_parity.py``
— the round-close gate (`scripts/round_end.sh`) sets it.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402
from oracle_harness import compare  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

DEFAULT_WINDOW = 50

_declared = set(Q.queries()) & set(Q.oracle_sql())
if os.environ.get("SPARK_GRAFT_FULL_PARITY"):
    CASES = sorted(_declared)
else:
    # catalog order = _CHECK_FIRST rotation: changed-this-round first
    CASES = [n for n in Q.queries() if n in _declared][:DEFAULT_WINDOW]


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(spark, name):
    fn = Q.queries()[name]
    sql = Q.oracle_sql()[name]
    n = compare(spark, name, fn, sql, SF_DIR)
    assert n >= 0

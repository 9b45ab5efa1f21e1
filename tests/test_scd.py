"""SCD2 changelog semantics pinned on a hand-built frame: consecutive
no-change collapse, equal-ts tiebreak, null-attribute transitions, and
is_current/valid_to interval chaining."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.operators.scd import scd2_from_changelog  # noqa: E402


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_scd2_collapse_and_intervals(spark):
    rows = [
        # user 1: a, a (dup -> collapsed), b, b (dup), a  => versions a,b,a
        (1, "a", _ts(1), 10),
        (1, "a", _ts(2), 11),
        (1, "b", _ts(3), 12),
        (1, "b", _ts(4), 13),
        (1, "a", _ts(5), 14),
        # user 2: single row => one current version
        (2, "x", _ts(1), 20),
    ]
    df = spark.createDataFrame(rows, "user_id int, state string, ts timestamp, eid int")
    out = scd2_from_changelog(df, "user_id", ["state"], "ts", tiebreak="eid")
    got = sorted(
        (r.user_id, r.state, r.valid_from.hour, r.valid_to.hour if r.valid_to else None, r.is_current)
        for r in out.collect()
    )
    assert got == [
        (1, "a", 1, 3, False),
        (1, "a", 5, None, True),
        (1, "b", 3, 5, False),
        (2, "x", 1, None, True),
    ]


def test_scd2_equal_ts_tiebreak_and_null_attr(spark):
    rows = [
        # equal ts: eid orders them -> a then b; b survives as the change
        (1, "a", _ts(1), 1),
        (1, "b", _ts(1), 2),
        # null attribute is a real state: b -> NULL -> b are three versions,
        # NULL -> NULL collapses
        (1, None, _ts(2), 3),
        (1, None, _ts(3), 4),
        (1, "b", _ts(4), 5),
    ]
    df = spark.createDataFrame(rows, "user_id int, state string, ts timestamp, eid int")
    out = scd2_from_changelog(df, "user_id", ["state"], "ts", tiebreak="eid")
    got = sorted(
        ((r.state or "<null>"), r.valid_from.hour, r.is_current) for r in out.collect()
    )
    assert got == [
        ("<null>", 2, False),
        ("a", 1, False),
        ("b", 1, False),
        ("b", 4, True),
    ]

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


def test_scd2_matches_python_loop_hypothesis(spark):
    """Randomized SCD2 construction vs a per-key Python loop: null-safe
    change detection (None is a value), equal-timestamp tiebreak, version
    intervals [ts, next_ts) with NULL valid_to + is_current on the last.
    Shapes: keys with one row, long no-change runs, None attrs, ts
    collisions resolved by the tiebreak id."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    base = dt.datetime(2024, 1, 1)
    rows_strat = st.lists(
        st.tuples(
            st.integers(1, 2),                       # key
            st.integers(0, 20),                      # ts minute (collisions likely)
            st.sampled_from(["a", "b", None]),       # attr1
            st.integers(0, 1),                       # attr2
        ),
        min_size=1,
        max_size=20,
    )

    @given(rows_strat)
    @settings(max_examples=10, deadline=None)
    def check(rows):
        data = [
            (k, base + dt.timedelta(minutes=m), i, s, n)
            for i, (k, m, s, n) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            data, "k long, ts timestamp, eid long, s string, n long"
        )
        out = scd2_from_changelog(df, "k", ["s", "n"], "ts", tiebreak="eid")
        canon = lambda t: [repr(x) for x in t]  # noqa: E731 — None-safe sort
        got = sorted(
            (
                (r["k"], r["valid_from"], r["s"], r["n"], r["valid_to"], r["is_current"])
                for r in out.collect()
            ),
            key=canon,
        )

        want = []
        by_key = {}
        for k, ts, i, s, n in data:
            by_key.setdefault(k, []).append((ts, i, s, n))
        for k, evs in by_key.items():
            evs.sort(key=lambda e: (e[0], e[1]))
            versions = []
            prev = object()
            for ts, i, s, n in evs:
                if (s, n) != prev:
                    versions.append((ts, s, n))
                    prev = (s, n)
            for j, (ts, s, n) in enumerate(versions):
                nxt = versions[j + 1][0] if j + 1 < len(versions) else None
                want.append((k, ts, s, n, nxt, nxt is None))
        assert got == sorted(want, key=canon)

    check()

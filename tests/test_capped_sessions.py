"""Capped-session semantics on crafted boundary rows (batch twin), plus
stream==batch equivalence at sf0.001 via the driver queries."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.streaming.stateful import capped_sessions_batch  # noqa: E402


def _t(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_batch_semantics_boundaries(spark):
    rows = [
        # run 1: gap of exactly 30 min does NOT split (strict >)
        (1, _t(0), 1, 1.0),
        (1, _t(30), 2, 1.0),
        # 31-min gap splits -> run 2 starts at _t(61)
        (1, _t(61), 3, 1.0),
        # 30-min steps keep the run alive past the 2h cap: events at
        # +30/+60/+90 stay in chunk 0, +120 lands exactly on the cap
        # boundary (floor(120/120) = 1) -> new session, cap-aligned
        (1, _t(61 + 30), 4, 1.0),
        (1, _t(61 + 60), 5, 1.0),
        (1, _t(61 + 90), 6, 1.0),
        (1, _t(61 + 120), 7, 1.0),
        (1, _t(61 + 150), 8, 1.0),
    ]
    out = capped_sessions_batch(
        spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    ).collect()
    sessions = sorted((r["session_start"], r["n_events"]) for r in out)
    assert sessions == [
        (_t(0), 2),          # first run, one chunk
        (_t(61), 4),         # second run chunk 0 (61..151 min)
        (_t(61 + 120), 2),   # second run chunk 1 (cap-aligned split)
    ]


def test_stream_equals_batch_sf0001(spark):
    from simpletasks_data_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    key = lambda r: (r["user_id"], str(r["session_start"]))  # noqa: E731
    batch = {key(r): (r["n_events"], r["total_value"]) for r in Q.queries()["capped_sessions"](spark, sf).collect()}
    stream = {key(r): (r["n_events"], r["total_value"]) for r in Q.queries()["streaming_capped_sessions"](spark, sf).collect()}
    assert batch == stream and len(batch) > 0


def test_capped_sessions_matches_python_loop_hypothesis(spark):
    """Randomized capped-session semantics vs a per-user Python loop:
    strict->gap splits between consecutive events, cap chunking via
    floor((ts - run_start)/cap) WITHIN a gap-run, per-chunk min/max/count/
    sum. Shapes: duplicate timestamps (event_id tie-break), events exactly
    on gap and cap boundaries, single-event users."""
    import math

    from hypothesis import given, settings, strategies as st

    ev_strat = st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 600)), min_size=1, max_size=25
    )

    @given(ev_strat)
    @settings(max_examples=10, deadline=None)
    def check(rows):
        data = [
            (u, _t(m), i, 0.5 * ((i % 4) + 1)) for i, (u, m) in enumerate(rows)
        ]
        out = capped_sessions_batch(
            spark.createDataFrame(
                data, "user_id long, ts timestamp, event_id long, value double"
            )
        ).collect()
        got = {
            (r["user_id"], r["session_start"]): (
                r["session_end"], r["n_events"], r["total_value"]
            )
            for r in out
        }

        want = {}
        by_user = {}
        for u, ts, i, v in data:
            by_user.setdefault(u, []).append((ts, i, v))
        GAP, CAP = 30 * 60, 120 * 60
        for u, evs in by_user.items():
            evs.sort()
            runs, cur = [], [evs[0]]
            for prev, nxt in zip(evs, evs[1:]):
                if (nxt[0] - prev[0]).total_seconds() > GAP:
                    runs.append(cur)
                    cur = []
                cur.append(nxt)
            runs.append(cur)
            for run in runs:
                start = run[0][0]
                chunks = {}
                for ts, i, v in run:
                    c = math.floor((ts - start).total_seconds() / CAP)
                    chunks.setdefault(c, []).append((ts, v))
                for evs_c in chunks.values():
                    tss = [t for t, _ in evs_c]
                    want[(u, min(tss))] = (
                        max(tss),
                        len(evs_c),
                        round(sum(v for _, v in evs_c), 4),
                    )
        assert got == want

    check()

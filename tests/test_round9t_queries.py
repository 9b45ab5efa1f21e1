"""Independent Python references, batch 19: the last streaming-family
replays — tumbling hourly rollup, the watermarked purchase→click
interval join, foreachBatch merge convergence (per-user last event),
and duration-capped sessions (30-min gap runs split into 2-hour
chunks)."""

import os
import sys
from collections import defaultdict

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _rhu(x, digits):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_streaming_hourly_rollup_matches_python(spark):
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["total_value"])
        for r in Q.queries()["streaming_hourly_rollup"](spark, SF).collect()
    }
    agg = defaultdict(lambda: [0, 0.0])
    for r in _events().itertuples():
        hour = r.ts.to_pydatetime().replace(minute=0, second=0, microsecond=0)
        e = agg[(hour, r.event_type)]
        e[0] += 1
        e[1] += float(r.value)
    assert set(got) == set(agg)
    for k, (n, tot) in agg.items():
        assert got[k][0] == n, k
        assert abs(got[k][1] - _rhu(tot, 4)) < 1e-6, k


def test_streaming_click_attribution_matches_python(spark):
    got = {
        (r["purchase_id"], r["click_id"]): r["click_value"]
        for r in Q.queries()["streaming_click_attribution"](spark, SF).collect()
    }
    ev = _events()
    purchases = ev[ev.event_type == "purchase"]
    clicks = ev[ev.event_type == "click"]
    by_user = defaultdict(list)
    for c in clicks.itertuples():
        by_user[int(c.user_id)].append(c)
    want = {}
    for p in purchases.itertuples():
        for c in by_user.get(int(p.user_id), ()):
            dt = (c.ts - p.ts).total_seconds()
            if 0 <= dt <= 7200:
                want[(int(p.event_id), int(c.event_id))] = _rhu(float(c.value), 4)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k


def test_streaming_foreachbatch_merge_matches_python(spark):
    got = {
        r["user_id"]: r["last_value"]
        for r in Q.queries()["streaming_foreachbatch_merge"](spark, SF).collect()
    }
    best = {}
    for r in _events().itertuples():
        uid = int(r.user_id)
        if uid not in best or int(r.event_id) > best[uid][0]:
            best[uid] = (int(r.event_id), float(r.value))
    want = {uid: v for uid, (_, v) in best.items()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k


def _capped_sessions_python():
    """30-min gap runs, each split into 2-hour chunks from run start."""
    agg = {}
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    for uid, g in ev.groupby("user_id", sort=False):
        run_id, prev, run_start = 0, None, None
        for r in g.itertuples():
            ts = r.ts.to_pydatetime()
            if prev is None or (ts - prev).total_seconds() > 1800:
                run_id += 1
                run_start = ts
            prev = ts
            chunk = int((ts - run_start).total_seconds() * 1e6) // 7_200_000_000
            key = (int(uid), run_id, chunk)
            e = agg.setdefault(key, [None, None, 0, 0.0])
            e[0] = ts if e[0] is None else min(e[0], ts)
            e[1] = ts if e[1] is None else max(e[1], ts)
            e[2] += 1
            e[3] += float(r.value)
    return {
        (k[0], v[0]): (v[1], v[2], _rhu(v[3], 4)) for k, v in agg.items()
    }


def test_capped_sessions_both_engines_match_python(spark):
    """One python chunker pins BOTH the batch window form and the
    applyInPandasWithState streaming form (same contract, same oracle)."""
    want = _capped_sessions_python()
    for qname in ("capped_sessions", "streaming_capped_sessions"):
        got = {
            (r["user_id"], r["session_start"]): (
                r["session_end"], r["n_events"], r["total_value"],
            )
            for r in Q.queries()[qname](spark, SF).collect()
        }
        assert set(got) == set(want), qname
        for k, (end, n, tot) in want.items():
            g = got[k]
            assert g[0] == end and g[1] == n, (qname, k)
            assert abs(g[2] - tot) < 1e-6, (qname, k)

"""Independent Python references, batch 18: four more streaming
operators replayed by a third implementation — sliding windows,
the complete-mode trending top-k, watermarked first-arrival dedup,
and the per-hour streaming HyperLogLog."""

import datetime
import hashlib
import json
import math
import os
import sys
from collections import Counter, defaultdict

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


def _floor_hour(ts):
    return ts.replace(minute=0, second=0, microsecond=0)


def test_streaming_sliding_windows_matches_python(spark):
    """Every event lands in exactly two 2h/1h-slide windows: the one
    starting at its floor-hour and the one an hour earlier."""
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in Q.queries()["streaming_sliding_windows"](spark, SF).collect()
    }
    agg = defaultdict(lambda: [0, 0.0])
    for r in _events().itertuples():
        fh = _floor_hour(r.ts.to_pydatetime())
        for start in (fh - datetime.timedelta(hours=1), fh):
            e = agg[(start, r.event_type)]
            e[0] += 1
            e[1] += float(r.value)
    assert set(got) == set(agg)
    for k, (n, tot) in agg.items():
        assert got[k][0] == n, k
        assert abs(got[k][1] - _rhu(tot, 4)) < 1e-6, k


def test_streaming_trending_topk_matches_python(spark):
    got = {
        (r["day"], r["rnk"]): (r["page"], r["n"])
        for r in Q.queries()["streaming_trending_topk"](spark, SF).collect()
    }
    cnt = Counter()
    for r in _events().itertuples():
        if r.event_type != "view":
            continue
        k = json.loads(r.props).get("k")
        if k is None:
            continue
        cnt[(r.ts.date(), str(k))] += 1
    per_day = defaultdict(list)
    for (day, page), n in cnt.items():
        per_day[day].append((page, n))
    want = {}
    for day, items in per_day.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for rnk, (page, n) in enumerate(items[:3], start=1):
            want[(day, rnk)] = (page, n)
    assert got == want


def test_streaming_exact_dedup_matches_python(spark):
    got = {
        (r["user_id"], r["event_type"])
        for r in Q.queries()["streaming_exact_dedup"](spark, SF).collect()
    }
    want = {
        (int(r.user_id), r.event_type) for r in _events().itertuples()
    }
    assert got == want


def test_streaming_hll_distinct_users_matches_python(spark):
    got = {
        r["hour"]: r["est_distinct"]
        for r in Q.queries()["streaming_hll_distinct_users"](spark, SF).collect()
    }
    regs = defaultdict(dict)
    for r in _events().itertuples():
        h = int(hashlib.md5(str(int(r.user_id)).encode()).hexdigest()[:15], 16)
        bucket, w = h % 256, h >> 8
        rho = 53 if w == 0 else 53 - w.bit_length()
        hour = _floor_hour(r.ts.to_pydatetime())
        regs[hour][bucket] = max(regs[hour].get(bucket, 0), rho)
    alpha = 0.7213 / (1.0 + 1.079 / 256)
    want = {}
    for hour, br in regs.items():
        z = sum(2.0 ** -v for v in br.values()) + (256 - len(br))
        v = float(256 - len(br))
        raw = alpha * 256 * 256 / z
        est = 256.0 * math.log(256.0 / v) if (raw <= 640.0 and v > 0) else raw
        want[hour] = _rhu(est, 4)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k

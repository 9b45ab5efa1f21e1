"""operators/linkage.passjoin_pairs: pigeonhole-exact edit-distance join."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.operators.linkage import passjoin_pairs  # noqa: E402


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, t string")
    return {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in passjoin_pairs(df, "id", "t", **kw).collect()
    }


def test_passjoin_exact_distances(spark):
    rows = [
        (1, "the quick brown fox jump"),   # 24 chars
        (2, "the quick brown fox jump"),   # identical -> 0
        (3, "the quick brewn fox jump"),   # 1 substitution
        (4, "the quick brewn fax jump"),   # 2 substitutions
        (5, "the quack brewn fax jump"),   # 3 subs from 1 -> excluded
        (6, "completely different str"),
    ]
    got = _pairs(spark, rows, key_len=24, max_distance=2)
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1
    assert got[(1, 4)] == 2
    assert (1, 5) not in got          # distance 3 > threshold
    assert got[(4, 5)] == 1           # still caught relative to 4
    assert not any(6 in p for p in got)


def test_passjoin_catches_indels_and_first_segment_edits(spark):
    rows = [
        (1, "abcdefghijklmnopqrstuvwx"),
        (2, "Xbcdefghijklmnopqrstuvwx"),   # edit in segment 0
        (3, "bcdefghijklmnopqrstuvwxZ"),   # deletion at front (shifted)
    ]
    got = _pairs(spark, rows, key_len=24, max_distance=2)
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 2  # delete 'a', append 'Z'


def test_passjoin_short_strings_padded(spark):
    rows = [(1, "cat"), (2, "cot"), (3, "dog")]
    got = _pairs(spark, rows, key_len=24, max_distance=2)
    assert got[(1, 2)] == 1 and (1, 3) not in got


def test_passjoin_rejects_bad_key_len(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "id long, t string")
    with pytest.raises(ValueError):
        passjoin_pairs(df, "id", "t", key_len=25, max_distance=2)


def test_passjoin_matches_python_dp_hypothesis(spark):
    """Randomized exactness vs a full Python DP Levenshtein over the
    same padded fixed-length keys: every pair within the threshold is
    found (pigeonhole recall) with the exact distance, nothing outside
    it. Small alphabet so substitutions/indels land in every segment."""
    from hypothesis import given, settings, strategies as st

    texts = st.lists(
        st.text(alphabet="abc", min_size=0, max_size=10), min_size=2, max_size=12
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    @given(texts, st.sampled_from([1, 2]))
    @settings(max_examples=8, deadline=None)
    def check(ts, d):
        key_len = 8  # multiple of d+1 for both d in {1, 2}? 8 % 3 != 0
        key_len = 6 if d == 2 else 8
        df = spark.createDataFrame(list(enumerate(ts)), "id long, t string")
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in passjoin_pairs(
                df, "id", "t", key_len=key_len, max_distance=d
            ).collect()
        }
        keys = [t[:key_len].ljust(key_len, "#") for t in ts]
        want = {
            (i, j): lev(keys[i], keys[j])
            for i in range(len(ts))
            for j in range(i + 1, len(ts))
            if lev(keys[i], keys[j]) <= d
        }
        assert got == want

    check()

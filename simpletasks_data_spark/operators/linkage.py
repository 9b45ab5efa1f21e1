"""Record linkage / entity resolution over structured tables.

``blocked_entity_pairs`` is the classic two-phase shape: cheap BLOCKING
bounds the quadratic candidate space, then an edit-distance VERIFY keeps
true near-matches. This is the structured-records sibling of the text
fuzzy-dedup family (operators/dedupe.py) — same
candidate-generation-then-verify design, with string edit distance in
place of Jaccard.

Two blocking strategies:

- ``"deletes"`` (default, exact for ``max_distance == 1``): the
  symmetric-delete (SymSpell) neighborhood — every record emits its name
  plus each single-character deletion (L+1 keys); two names are within
  edit distance 1 IFF their neighborhoods intersect (substitution →
  both delete the differing position; insert/delete → the shorter name
  IS a variant of the longer). Candidate generation becomes an
  equi-join on (block, variant): O(n·L) keys total, block sizes track
  true near-match density instead of the block column's cardinality —
  the shape that survives skew (a million records sharing one block
  value never go quadratic).
- ``"block"``: plain within-block self-join — supports any
  ``max_distance``, but per-block cost is quadratic; size blocks the
  way LSH bands are sized.

Either way a length pre-filter runs before the edit distance
(|len(a) - len(b)| > d implies distance > d) and Spark's bounded
``levenshtein(l, r, threshold)`` early-exits the DP — both prune the
verify, neither changes the result.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_entity_pairs", "passjoin_pairs"]


def _verify(cand: DataFrame, block_cols: list, max_distance: int) -> DataFrame:
    dist = F.levenshtein("_nm_a", "_nm_b", max_distance)
    return (
        cand.where(
            (F.length("_nm_a") - F.length("_nm_b")).between(
                -max_distance, max_distance
            )
        )
        .withColumn("distance", dist)
        .where(F.col("distance") >= 0)  # bounded form returns -1 past the cap
        .select(
            "id_a",
            "id_b",
            *block_cols,
            F.col("distance").cast("long").alias("distance"),
        )
    )


def blocked_entity_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_distance: int = 1,
    strategy: str = "deletes",
) -> DataFrame:
    """Pairs (id_a < id_b) sharing every ``block_cols`` value whose
    ``name_col`` edit distance is <= ``max_distance``. Output:
    (id_a, id_b, *block_cols, distance). ``strategy="deletes"`` requires
    ``max_distance == 1`` (the neighborhood is exact there); use
    ``"block"`` for larger radii."""
    block_cols = list(block_cols)
    base = df.select(
        F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"), *block_cols
    )
    if strategy == "deletes":
        if max_distance != 1:
            raise ValueError("deletes blocking is exact only for max_distance=1")
        # name + all single-deletion variants; dedup within the record so
        # repeated characters don't emit duplicate keys
        variants = F.array_distinct(
            F.concat(
                F.array(F.col("_nm")),
                F.transform(
                    F.sequence(F.lit(1), F.length("_nm")),
                    lambda i: F.concat(
                        F.substr(F.col("_nm"), F.lit(1), i - 1),
                        F.substr(F.col("_nm"), i + 1, F.length("_nm")),
                    ),
                ),
            )
        )
        keyed = base.select(
            "_id", "_nm", *block_cols, F.explode(variants).alias("_var")
        )
        a = keyed.select(
            F.col("_id").alias("id_a"), F.col("_nm").alias("_nm_a"), *block_cols, "_var"
        )
        b = keyed.select(
            F.col("_id").alias("id_b"), F.col("_nm").alias("_nm_b"), *block_cols, "_var"
        )
        cand = (
            a.join(b, block_cols + ["_var"])
            .where(F.col("id_a") < F.col("id_b"))
            # a pair can share several variants (e.g. equal names share
            # all L+1): dedupe BEFORE the verify so levenshtein runs once
            # per pair
            .select("id_a", "id_b", "_nm_a", "_nm_b", *block_cols)
            .distinct()
        )
        return _verify(cand, block_cols, max_distance)
    a = base.select(
        F.col("_id").alias("id_a"), F.col("_nm").alias("_nm_a"), *block_cols
    )
    b = base.select(
        F.col("_id").alias("id_b"), F.col("_nm").alias("_nm_b"), *block_cols
    )
    cand = a.join(b, block_cols).where(F.col("id_a") < F.col("id_b"))
    return _verify(cand, block_cols, max_distance)


def passjoin_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    key_len: int = 24,
    max_distance: int = 2,
    pad_char: str = "#",
) -> DataFrame:
    """PassJoin-style segment blocking (Li, Deng, Feng: "PassJoin: a
    partition-based method for similarity joins", VLDB 2012) — the
    edit-distance similarity JOIN that is exact for ANY threshold, the
    missing tier between the d=1 symmetric-delete neighborhood above
    and quadratic within-block verify.

    Every row's text is cut to a fixed-length key (``rpad(substr(s, 1,
    key_len))`` so all keys compare at equal length), and the key is
    partitioned into ``max_distance + 1`` equal segments. Pigeonhole:
    an edit script of cost <= d touches at most d segments, so at least
    one segment of A survives VERBATIM in B, displaced by at most d
    positions (one per preceding indel). Candidate generation is
    therefore an EQUI-JOIN of segment grams against position-shifted
    probe grams — d+1 seg keys and at most (d+1)(2d+1) probe keys per
    row, never an all-pairs product — followed by one bounded-DP
    levenshtein verify per distinct pair (Spark's threshold variant
    early-exits the DP row when the band exceeds d).

    Returns (id_a, id_b, dist) with id_a < id_b and dist <= d. Scale
    shape: key space is fixed-length so gram-bucket sizes track true
    near-match density; the distinct() before verify bounds levenshtein
    calls by the candidate count; no stage holds more than one gram
    bucket. ``key_len`` must be divisible by ``max_distance + 1``.
    """
    n_seg = max_distance + 1
    if key_len % n_seg:
        raise ValueError(f"key_len={key_len} not divisible by {n_seg} segments")
    seg_len = key_len // n_seg

    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.rpad(F.substring(F.col(text_col), 1, key_len), key_len, pad_char).alias("_key"),
    )
    seg_rows = []
    for i in range(n_seg):
        start = 1 + i * seg_len
        seg_rows.append(
            F.struct(F.lit(i).alias("i"),
                     F.substring("_key", start, seg_len).alias("gram"))
        )
    segs = keyed.select(
        "_id", "_key", F.explode(F.array(*seg_rows)).alias("_s")
    ).select("_id", "_key", F.col("_s.i").alias("i"), F.col("_s.gram").alias("gram"))

    probe_rows = []
    for i in range(n_seg):
        for shift in range(-max_distance, max_distance + 1):
            start = 1 + i * seg_len + shift
            if 1 <= start <= key_len - seg_len + 1:
                probe_rows.append(
                    F.struct(F.lit(i).alias("i"),
                             F.substring("_key", start, seg_len).alias("gram"))
                )
    probes = keyed.select(
        "_id", "_key", F.explode(F.array(*probe_rows)).alias("_p")
    ).select("_id", "_key", F.col("_p.i").alias("i"), F.col("_p.gram").alias("gram"))

    cand = (
        segs.alias("a")
        .join(probes.alias("b"), ["i", "gram"])
        .where(F.col("a._id") != F.col("b._id"))
        .select(
            F.least("a._id", "b._id").alias("id_a"),
            F.greatest("a._id", "b._id").alias("id_b"),
            F.least("a._key", "b._key").alias("_ka"),
            F.greatest("a._key", "b._key").alias("_kb"),
        )
        .distinct()
    )
    dist = F.levenshtein("_ka", "_kb", max_distance)
    return (
        cand.withColumn("dist", dist)
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )

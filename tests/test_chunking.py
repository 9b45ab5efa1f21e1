"""Chunking/packing edge cases: short docs, exact-fit windows, the
final-short-window rule, empty-doc exclusion, and pack straddling."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.operators import chunking as CH  # noqa: E402


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_windows(spark):
    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = CH.chunk_documents(
        _docs(spark, [words, "a b c", ""]), size=4, stride=3
    )
    rows = {(r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"]) for r in df.collect()}
    # doc 0: 10 tokens, size 4, stride 3 -> 1 + ceil(6/3) = 3 chunks
    assert rows[(0, 1)] == (4, "w0 w1 w2 w3")
    assert rows[(0, 2)] == (4, "w3 w4 w5 w6")
    assert rows[(0, 3)] == (4, "w6 w7 w8 w9")
    # doc 1: shorter than size -> single short chunk
    assert rows[(1, 1)] == (3, "a b c")
    # doc 2: empty -> no chunks
    assert not any(k[0] == 2 for k in rows)


def test_chunk_short_tail(spark):
    words = " ".join(f"w{i}" for i in range(9))  # 9 tokens, size 4, stride 3
    df = CH.chunk_documents(_docs(spark, [words]), size=4, stride=3)
    rows = sorted((r["chunk_idx"], r["n_tokens"]) for r in df.collect())
    # 1 + ceil(5/3) = 3 chunks; last starts at token 7 -> 3 tokens
    assert rows == [(1, 4), (2, 4), (3, 3)]


def test_pack_offsets_and_straddle(spark):
    texts = [" ".join(f"w{i}" for i in range(n)) for n in (5, 5, 5)]
    df = CH.pack_sequences(_docs(spark, texts), budget=8, shards=1)
    rows = sorted(
        (r["doc_id"], r["start_off"], r["first_pack"], r["last_pack"]) for r in df.collect()
    )
    # shard stream: doc0 [0,5), doc1 [5,10), doc2 [10,15) with budget 8
    assert rows == [(0, 0, 0, 0), (1, 5, 0, 1), (2, 10, 1, 1)]
    # doc1 straddles the pack boundary at token 8
    assert rows[1][2] != rows[1][3]


def test_cdc_chunking_shift_invariance(spark):
    """The content-defined property: inserting text mid-document leaves
    every chunk outside the edit neighborhood with an UNCHANGED hash
    (fixed-size chunking would shift and re-hash the whole tail)."""
    import hashlib
    import random

    from simpletasks_data_spark.operators.chunking import cdc_chunk_documents

    rng = random.Random(7)
    base = "".join(rng.choice("abcdefgh ") for _ in range(4000))
    edited = base[:2000] + "INSERTED-PARAGRAPH " + base[2000:]
    df = spark.createDataFrame([(0, base), (1, edited)], "doc_id long, text string")
    out = cdc_chunk_documents(df).collect()
    h0 = [r.chunk_hash for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)) if r.doc_id == 0]
    h1 = [r.chunk_hash for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)) if r.doc_id == 1]
    # chunks before the edit point are identical ...
    common_prefix = 0
    for a, b in zip(h0, h1):
        if a != b:
            break
        common_prefix += 1
    # ... and the tail re-aligns: all but at most 2 of the original's
    # post-edit chunks reappear in the edited doc
    tail0 = set(h0[common_prefix:])
    tail1 = set(h1[common_prefix:])
    assert len(h0) > 4, "fixture too short to be meaningful"
    assert len(tail0 - tail1) <= 2, (len(h0), common_prefix, len(tail0 - tail1))
    # sanity: the two docs are not identical
    assert h0 != h1

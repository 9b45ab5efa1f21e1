"""Document chunking and sequence packing for LLM pretraining pipelines.

- **chunking**: split each document into overlapping fixed-size token
  windows (the HF ``return_overflowing_tokens`` convention: windows of
  ``size`` tokens every ``stride`` tokens; the last window may be
  shorter). Map-only — tokens, window starts, and the posexplode are all
  per-row array expressions, so the 100 TB plan is one scan with no
  shuffle.
- **packing**: assign documents to fixed-token-budget training sequences
  the way GPT-style pretraining does (concatenate the stream, slice
  every ``budget`` tokens — documents may straddle pack boundaries).
  The scalable shape: hash-shard the corpus, then a within-shard
  running-sum window gives each doc its token offset; pack ids are pure
  arithmetic on the offset. One shuffle on the shard key; shards are
  independent, so packing parallelizes to any cluster size (shards are
  the unit a downstream writer would emit as files).

Reference scope note: the reference engine (upOwa/simpletasks-data) has
no corpus operators; these extend the surface for training-data
pipelines per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .corpus import hash_bucket

__all__ = ["chunk_documents", "cdc_chunk_documents", "pack_sequences"]


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token windows per document: window ``i`` (1-based)
    covers tokens ``[(i-1)*stride + 1, (i-1)*stride + size]``; the number
    of windows is ``1 + ceil(max(n - size, 0) / stride)`` so every token
    is covered and the final window is the only short one. Empty
    documents yield no chunks."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    t = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    n = F.size("_toks")
    m = F.greatest(n - F.lit(size), F.lit(0))
    # ceil(m / stride) via integer arithmetic (exact, no float)
    n_chunks = F.lit(1) + F.floor((m + F.lit(stride - 1)) / F.lit(stride)).cast("long")
    t = t.where(n > 0).select(
        id_col,
        "_toks",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.slice("_toks", (i - 1) * stride + 1, size),
            )
        ).alias("_pos", "_chunk"),
    )
    return t.select(
        id_col,
        (F.col("_pos") + 1).cast("long").alias("chunk_idx"),
        F.size("_chunk").cast("long").alias("n_tokens"),
        F.concat_ws(" ", "_chunk").alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 256,
    shards: int = 8,
) -> DataFrame:
    """Concat-and-chunk packing plan: per document, its shard, token
    count, exclusive start offset in the shard's concatenated token
    stream, and the first/last pack (``budget``-token sequence) it lands
    in. ``last_pack > first_pack`` means the document straddles a pack
    boundary. Offsets are deterministic: shard = portable hash of the id,
    order within shard = id order."""
    if budget <= 0 or shards <= 0:
        raise ValueError("budget and shards must be positive")
    t = docs.select(
        F.col(id_col),
        hash_bucket(F.col(id_col), shards).alias("shard"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = t.withColumn("start_off", (F.sum("n_tokens").over(w) - F.col("n_tokens")))
    return t.select(
        id_col,
        "shard",
        "n_tokens",
        "start_off",
        F.floor(F.col("start_off") / budget).cast("long").alias("first_pack"),
        F.floor((F.col("start_off") + F.col("n_tokens") - 1) / budget)
        .cast("long")
        .alias("last_pack"),
    )


def cdc_chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall where a rolling
    hash of the trailing ``window`` characters hits a fixed residue — so
    boundaries are a pure function of LOCAL content. That
    shift-invariance is the point: insert a paragraph in the middle of a
    document and every chunk after it re-aligns, so downstream
    chunk-hash dedup (the backup/dedup-storage trick, LLM-corpus
    incremental ingestion) still recognizes all unchanged chunks, where
    fixed-size chunking would re-emit the whole tail as new.

    Expected chunk length is the modulus (257) plus the window. No
    min/max chunk clamps: clamps make a boundary depend on the previous
    boundary (sequential state); the pure form is embarrassingly
    per-document — map-only, one scan, no shuffle — and has an exact
    ANSI-SQL twin for the oracle.

    The window hash is a Rabin-style polynomial over character CODE
    POINTS (sum of code(c_{i-k}) * 31^k, boundary when ≡ 0 mod 257) in
    exact int64 arithmetic. Execution is an Arrow ``mapInPandas`` kernel:
    codepoints come from a utf-32 reinterpretation (vectorized, no
    per-char Python), the rolling hash is one ``np.convolve``, and only
    the final per-chunk content hash pays a digest. Chosen over the pure
    Column-expression form deliberately — higher-order-function lambdas
    evaluate interpreted per element, and at ~8 reads per position the
    HOF draft was 10x slower than this kernel (the pyspark guide's
    "Arrow batch beats per-element evaluation on numeric kernels" case).

    Output: (doc_id, chunk_idx, chunk_len, chunk_hash) — chunk content
    rides as its md5, which is what a dedup store keys on.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    modulus = 257
    kernel = np.array([31 ** k for k in range(window)], dtype=np.int64)

    def chunk(batches):
        for pdf in batches:
            ids, idxs, lens, hashes = [], [], [], []
            for did, text in zip(pdf["_id"].to_numpy(), pdf["_txt"].to_numpy()):
                if text is None:
                    continue
                L = len(text)
                codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                bounds = [0]
                if L >= window:
                    # conv[j] = sum_k codes[j + window - 1 - k] * kernel[k]
                    # -> trailing-window hash ending at 1-based position
                    # j + window; np.convolve("valid") keeps int64 exact
                    conv = np.convolve(codes, kernel, mode="valid")
                    cuts = np.nonzero(conv % modulus == 0)[0] + window
                    bounds.extend(int(c) for c in cuts)
                if not bounds or bounds[-1] != L:
                    bounds.append(L)
                for j in range(1, len(bounds)):
                    s_, e_ = bounds[j - 1], bounds[j]
                    if e_ <= s_:
                        continue
                    ids.append(did)
                    idxs.append(j)
                    lens.append(e_ - s_)
                    hashes.append(hashlib.md5(text[s_:e_].encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "chunk_len": pd.Series(lens, dtype="int64"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    base = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    return base.mapInPandas(
        chunk, "doc_id long, chunk_idx long, chunk_len long, chunk_hash string"
    )

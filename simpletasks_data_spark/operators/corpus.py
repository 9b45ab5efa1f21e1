"""Corpus-management operators for large-scale training-data pipelines:
deterministic splits, stratified sampling, vocabulary building, and
benchmark decontamination.

All native DataFrame composition (no UDFs, no driver loops), so Catalyst
plans them and every step scales:

- **hash split**: train/val/test assignment from a portable md5-derived
  bucket of the document key — map-only, reproducible across engines,
  runs, and cluster sizes (no ``rand()``, no global sort).
- **stratified sample**: deterministic top-k per stratum ranked by the
  same portable hash — one shuffle on the stratum key; the hash order is
  a uniform random permutation per stratum, so the first k ARE a uniform
  sample, but a reproducible one.
- **vocabulary**: token explode -> count -> top-n. The explode is
  map-side; the count is a partial-aggregated hash agg on the token (the
  natural key, high cardinality => well-spread shuffle).
- **decontamination**: flag corpus documents sharing too many token
  n-grams with a benchmark set — the standard eval-leakage guard for LLM
  training corpora. The benchmark shingle set is tiny relative to the
  corpus, so it broadcasts; the corpus side stays a map-side explode +
  broadcast hash join + one agg by doc. At 100 TB the corpus never
  shuffles on shingles.

Reference scope note: the reference engine (upOwa/simpletasks-data) has
no corpus operators; these extend the surface for training-data
pipelines per the build brief.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = [
    "hash_bucket",
    "hash_split",
    "stratified_sample",
    "vocab_top_tokens",
    "ngram_shingles",
    "ngram_lm_counts",
    "decontaminate",
    "tfidf_top_terms",
    "bm25_related_docs",
    "weighted_sample",
    "balance_mixture",
    "dsir_logratio_weights",
    "budget_select_by_quality",
    "jaccard_related_docs",
    "rrf_fuse",
]


def hash_bucket(key: Column, buckets: int = 1000) -> Column:
    """Portable uniform bucket in [0, buckets): 60 bits of md5(key) mod
    buckets. Matches DuckDB
    ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % buckets``
    exactly — never an engine-private hash."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    return h % buckets


def hash_split(
    df: DataFrame, key_col: str, boundaries: Dict[str, int] | None = None
) -> DataFrame:
    """Add a deterministic ``split`` column. ``boundaries`` maps split
    name -> exclusive upper bucket bound out of 1000, in order
    (default train<900, val<950, test<1000). Map-only: no shuffle, no
    state, stable under retries and cluster resizing."""
    bounds = boundaries or {"train": 900, "val": 950, "test": 1000}
    b = hash_bucket(F.col(key_col))
    expr = None
    for name, upper in bounds.items():
        expr = F.when(b < upper, F.lit(name)) if expr is None else expr.when(b < upper, F.lit(name))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, strata_cols: Sequence[str], k: int, key_col: str
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows within each stratum
    by the portable hash of the key (a uniform pseudo-random but
    reproducible order) and keep the first k. One shuffle on the strata
    columns; skew-safe as long as k << stratum size (the window only
    needs a per-partition top-k, which Spark's WindowGroupLimit pushes
    down before the sort at scale)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(F.col(key_col), 1 << 60), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
    )


def vocab_top_tokens(docs: DataFrame, text_col: str = "text", n: int = 100) -> DataFrame:
    """Corpus vocabulary: top-n tokens by document-frequency-weighted
    count. Explode is map-side; the count aggregates partially before
    the token-key shuffle; the global top-n is a tiny sort after the
    agg (rows = distinct tokens, not corpus size)."""
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    return counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(n)


def ngram_shingles(text_col: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-grams (space-joined) of the normalized text — per-document
    DISTINCT by default (the shingle-set form dedup/decontamination use);
    ``distinct=False`` keeps every occurrence (the multiset form LM
    counting needs). Materialize the token array to a column before
    calling if reused — HOF lambdas are not CSE'd."""
    toks = text_col
    starts = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination: for every corpus document, the fraction
    of its distinct token ``n``-grams that appear in ANY benchmark
    document; ``contaminated`` when the fraction >= ``threshold``.

    Scale shape: the benchmark shingle set (distinct grams across the
    benchmark) is broadcast — the 100 TB corpus side is a map-side
    explode joined against the broadcast set, then one aggregation keyed
    by document id. No corpus-side shuffle on shingles ever happens.
    """
    bench_shingles = (
        benchmark.select(F.col(text_col).alias("_t"))
        .select(tokens(F.col("_t")).alias("_toks"))
        .select(F.explode(ngram_shingles(F.col("_toks"), n)).alias("gram"))
        .distinct()
    )
    doc_grams = (
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(id_col, F.explode(ngram_shingles(F.col("_toks"), n)).alias("gram"))
    )
    joined = doc_grams.join(
        F.broadcast(bench_shingles.withColumn("_hit", F.lit(1))), on="gram", how="left"  # b: bench
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hits"),
    )
    ratio = F.col("n_hits") / F.col("n_shingles")
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_hits",
        F.round(ratio, 4).alias("overlap_ratio"),
        (ratio >= threshold).alias("contaminated"),
    )


def weighted_sample(
    df: DataFrame, weight: Column, key: Column, buckets: int = 10000
) -> DataFrame:
    """Deterministic Bernoulli sampling with per-row acceptance
    probability ``weight`` (clamped to [0, 1]): keep a row iff its
    portable hash fraction ``hash_bucket(key)/buckets`` falls below the
    weight. Map-only and reproducible across engines/runs/cluster sizes
    — the standard quality-weighted downsampling step (keep good docs
    with high probability, junk with low) without ``rand()``'s
    nondeterminism. Resolution is 1/buckets."""
    u = hash_bucket(key, buckets).cast("double") / F.lit(float(buckets))
    return df.where(u < F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0)))


def balance_mixture(
    docs: DataFrame,
    group_col: str,
    targets: Dict[str, float],
    key_col: str = "doc_id",
) -> DataFrame:
    """Downsample groups to hit a target mixture EXACTLY while keeping as
    much data as possible: the feasible corpus size is
    ``S = min_g(n_g / target_g)`` and each group keeps its hash-ranked
    first ``floor(S * target_g)`` rows (deterministic, uniform within
    group). Groups absent from ``targets`` are dropped.

    Scale shape: one tiny count agg (groups) joined back as a broadcast,
    then one rank window per group — the same single shuffle a stratified
    sample costs. A hot group concentrates its rows on one reducer; at
    100 TB rank the window on a salted sub-key and take per-salt quotas
    instead (the quota arithmetic is identical).
    """
    total_t = sum(targets.values())
    tgt = docs.sparkSession.createDataFrame(
        [(g, w / total_t) for g, w in targets.items()], f"{group_col} string, _tfrac double"
    )
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    scale = (
        counts.join(tgt, group_col)
        .select(F.min(F.col("_n") / F.col("_tfrac")).alias("_scale"))
    )
    quota = (
        counts.join(tgt, group_col)
        .crossJoin(F.broadcast(scale))  # b: 1row
        .select(
            group_col,
            F.floor(F.col("_scale") * F.col("_tfrac")).cast("long").alias("_quota"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), 1_000_000), key_col
    )
    ranked = docs.withColumn("_rank", F.row_number().over(w).cast("long"))
    return (
        ranked.join(F.broadcast(quota), group_col)  # b: grid
        .where(F.col("_rank") <= F.col("_quota"))
        .drop("_rank", "_quota")
    )


def temperature_mixture(
    docs: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened mixture resampling — the multilingual-LM
    recipe (sample groups proportional to ``p_g^alpha``): alpha=1 keeps
    the natural distribution, alpha=0 forces uniform, 0<alpha<1 boosts
    tail groups relative to the head. The target fractions are computed
    FROM the corpus itself (`p_g^alpha / sum p^alpha`), then realized
    exactly like :func:`balance_mixture`: feasible size
    ``S = min_g(n_g / t_g)`` (a downsample-only plan never invents rows
    for tail groups) and each group keeps its hash-ranked first
    ``floor(S * t_g)`` rows — deterministic, uniform within group.

    Same scale shape as balance_mixture: a tiny group-count agg broadcast
    back, one rank window per group."""
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    tgt = counts.select(
        group_col,
        "_n",
        (
            F.pow(F.col("_n").cast("double"), F.lit(alpha))
            / F.sum(F.pow(F.col("_n").cast("double"), F.lit(alpha))).over(
                Window.partitionBy()
            )
        ).alias("_tfrac"),
    )
    scale = tgt.select(F.min(F.col("_n") / F.col("_tfrac")).alias("_scale"))
    # The 1e-6 inside the floor absorbs cross-engine ULP differences in
    # pow/division (quotas are integers ~group sizes, so the epsilon can
    # never move a quota past the next integer on its own).
    quota = tgt.crossJoin(F.broadcast(scale)).select(  # b: 1row
        group_col,
        F.floor(F.col("_scale") * F.col("_tfrac") + F.lit(1e-6))
        .cast("long")
        .alias("_quota"),
    )
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), 1_000_000), key_col
    )
    ranked = docs.withColumn("_rank", F.row_number().over(w).cast("long"))
    return (
        ranked.join(F.broadcast(quota), group_col)  # b: grid
        .where(F.col("_rank") <= F.col("_quota"))
        .drop("_rank", "_quota")
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``), ties broken by token order.

    Scale shape: term frequencies are one partial-aggregated shuffle on
    the high-cardinality ``(doc, token)`` key; document frequencies
    reduce THAT result (rows = distinct doc-terms, not corpus tokens) to
    a vocabulary-sized table which is **broadcast** back — the corpus
    never shuffles on tokens a second time. The per-doc top-k window
    repartitions by doc id, the natural evenly-spread key. The corpus
    row count rides in as a broadcast single-row frame, not a driver
    ``.collect()``, so the whole plan stays one lazy DAG.

    Ranking uses the ROUNDED (4-decimal) score so the order is identical
    across engines regardless of last-ulp ``ln`` differences.
    """
    t = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    tok = t.select(id_col, F.explode("_toks").alias("token"))
    # Checkpoint the doc-term table: both the score join and the doc-freq
    # reduction consume it, and without the cut Catalyst forks the DAG
    # and scans + explodes the corpus TWICE (the df branch prunes the
    # count away, so the exchanges differ and nothing is reused).
    tf = (
        tok.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join((dfreq), "token")
        .crossJoin(F.broadcast(n_docs))  # b: 1row
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
                4,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tfidf", "rank")
    )


def ngram_lm_counts(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_count: int = 3,
) -> DataFrame:
    """n-gram language-model count tables (Kneser-Ney preparation): raw
    n-gram counts joined with the continuation statistic of each gram's
    suffix — N1+(. suffix) = how many distinct left words precede it,
    the count KN smoothing uses in place of raw frequency for lower
    orders.

    Scale shape: ONE explode of the corpus into n-grams feeding ONE
    map-side-combined count agg (the only data-sized shuffle — identical
    grams collapse per partition before moving). The continuation table
    derives from the count TABLE (already one row per distinct n-gram,
    so distinct-left-context count is a plain count(*) per suffix) —
    second agg and join run on |vocabulary| rows, not corpus rows. The
    ``min_count`` floor applies to the emitted rows only, AFTER
    continuation counts, so smoothing statistics see the full table.

    Output: gram, head (first word), suffix (n-1 words), n_occurrences,
    n_left_contexts.
    """
    from ..functions.text import tokens

    toks = tokens(F.col(text_col))
    grams = (
        docs.select(toks.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select(F.explode(ngram_shingles(F.col("_toks"), n, distinct=False)).alias("gram"))
    )
    head = F.substring_index("gram", " ", 1)
    suffix = F.substr(
        "gram", F.length(head) + F.lit(2), F.length("gram")
    )
    cnt = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .select("gram", head.alias("head"), suffix.alias("suffix"), "n_occurrences")
        # Feeds BOTH join branches (emitted rows + continuation agg);
        # Spark does not reuse subtrees across branches, so without
        # materialization the corpus explode+agg would run twice.
        .localCheckpoint(eager=True)
    )
    cont = cnt.groupBy("suffix").agg(
        F.count(F.lit(1)).cast("long").alias("n_left_contexts")
    )
    return (
        cnt.join(cont, "suffix")
        .where(F.col("n_occurrences") >= min_count)
        .select("gram", "head", "suffix", "n_occurrences", "n_left_contexts")
    )


def bm25_related_docs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_mod: int = 97,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_permille: int = 100,
    tf_frame: Optional[DataFrame] = None,
) -> DataFrame:
    """BM25 "more-like-this" retrieval: every document whose id hashes
    into the query stratum (``id % query_mod == 0``) retrieves its
    top-``k`` related documents from the corpus, scored by Okapi BM25
    over the shared vocabulary (query term frequency deliberately
    unweighted — the standard short-query simplification, documented
    here because the queries are whole documents).

    score(q, d) = sum over tokens t in q∩d of
        idf(t) * tf(d,t) * (k1+1) / (tf(d,t) + k1 * (1 - b + b*dl/avgdl))
    with idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)  (Lucene's form,
    always positive).

    Scale shape: ONE (doc, token) shuffle builds the term-frequency
    table (shared shape with ``tfidf_top_terms``, checkpointed so the
    doc-frequency reduction reuses it instead of re-exploding the
    corpus); doc frequencies and corpus stats are vocabulary-sized /
    single-row **broadcasts**; the query side is a thin (qid, token)
    slice that equi-joins the tf table on ``token`` — the corpus never
    cross-joins and never shuffles a second time. The per-query top-k
    window partitions on qid, the natural spread key. Ranking uses the
    4-decimal-rounded score (cross-engine ln parity) with doc-id
    tie-break.

    **Common-token fan-out bound**: a stopword-grade token (df near N)
    would make the candidate join quadratic-ish at scale — every query
    containing it matches almost every document. Tokens with
    ``df * 1000 > max_df_permille * N`` (default: df > 10% of the
    corpus) are dropped from the QUERY side before the candidate join,
    so they never fan out; their IDF is near the noise floor, and the
    identical integer-exact cut applies in the SQL oracle, keeping
    scores engine-exact rather than approximated. Set
    ``max_df_permille = 1000`` to disable.
    """
    if tf_frame is not None:
        # Caller-provided (id, token, tf) term-frequency table — the
        # session-store pattern: the tf shuffle is the only data-sized
        # stage here, so retrieval stacks that score the same corpus
        # twice (BM25 + Jaccard in hybrid RRF) build it once.
        tf = tf_frame
    else:
        t = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        tok = t.select(id_col, F.explode("_toks").alias("token"))
        tf = (
            tok.groupBy(id_col, "token")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            .localCheckpoint(eager=False)
        )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
    )
    # df ceiling: integer-exact (df * 1000 <= permille * N), applied to
    # the THIN query side before the candidate join so a stopword-grade
    # token never reaches the tf-side fan-out at all.
    kept_tokens = (
        dfreq.crossJoin(F.broadcast(stats.select("_n")))  # b: 1row
        .where(F.col("df") * 1000 <= max_df_permille * F.col("_n"))
        .select("token")
    )
    qterms = (
        tf.where((F.col(id_col) % query_mod) == 0)
        .select(F.col(id_col).alias("query_id"), "token")
        .join((kept_tokens), "token")
    )
    idf = F.log((F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
    )
    scored = (
        tf.join(qterms, "token")
        .where(F.col("query_id") != F.col(id_col))
        .join(dl, id_col)
        .join((dfreq), "token")
        .crossJoin(F.broadcast(stats))  # b: 1row
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(idf * tf_part), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "score")
    )


def kn_bigram_doc_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document mean log-probability under an interpolated
    Kneser-Ney BIGRAM model trained on the same corpus — the LM-based
    quality filter modern pipelines run after the heuristic gates
    (quality_unigram_logprob is the order-0 version; this one scores
    SEQUENCE plausibility, so shuffled or boilerplate-stitched text
    scores low even when its unigrams look fine):

        P(w2|w1) = max(c(w1w2) - D, 0)/c(w1·)
                 + D·N1+(w1·)/c(w1·) · N1+(·w2)/|bigrams|

    Scale shape: ONE corpus bigram explode feeds ONE count agg (the
    data-sized shuffle, map-side combined, checkpointed for its three
    consumers); the head/continuation tables reduce the vocabulary-
    sized count table; scoring joins the doc bigrams back to the
    gram-keyed model (equi-join — broadcast when the vocabulary allows,
    Zipf keeps it sublinear in corpus size) and folds ln P in one
    per-doc avg. Trained-on-self means every scored bigram exists in
    the model — no backoff path needed here; for held-out scoring add
    the unigram-floor backoff before the join.
    Output: (doc_id, n_bigrams, avg_logprob), docs with >= 2 tokens.
    """
    toks = tokens(F.col(text_col))
    bg = (
        docs.select(F.col(id_col), toks.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice("_t", 1, F.size("_t") - 1),
                    F.slice("_t", 2, F.size("_t") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("gram"),
        )
    )
    cnt = (
        bg.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .withColumn("head", F.substring_index("gram", " ", 1))
        .withColumn("tail", F.substring_index("gram", " ", -1))
        .localCheckpoint(eager=True)
    )
    h = cnt.groupBy("head").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("nright"),
    )
    tl = cnt.groupBy("tail").agg(F.count(F.lit(1)).cast("long").alias("nleft"))
    nb = cnt.agg(F.count(F.lit(1)).cast("long").alias("nbi"))
    model = (
        cnt.join(h, "head")
        .join(tl, "tail")
        .crossJoin(F.broadcast(nb))  # b: 1row
        .select("gram", "c12", "c1", "nright", "nleft", "nbi")
    )
    p = (
        F.greatest(F.col("c12") - discount, F.lit(0.0)) / F.col("c1")
        + (discount * F.col("nright") / F.col("c1"))
        * (F.col("nleft") / F.col("nbi"))
    )
    return (
        bg.join(model, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(F.log(p)), 4).alias("avg_logprob"),
        )
    )


def cap_per_group(
    df: DataFrame,
    group_col,
    order_cols,
    n: int,
) -> DataFrame:
    """Diversity cap: keep at most ``n`` rows per group, chosen by a
    DETERMINISTIC rank (``order_cols`` must totally order rows within a
    group — include a unique id as the last key). The standard curation
    guard against single-host/single-source domination of a training
    mix: a crawl where one domain contributes 10M pages gets capped to
    its best ``n`` by quality before mixing.

    Scale shape: one shuffle on the group key; the window's sort spills,
    and the filter drops rows before anything downstream — state per
    group never exceeds the sort buffer, and the output is bounded at
    ``n * n_groups`` rows regardless of skew (the hot-domain problem
    this operator exists to kill).
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_cap_rk", F.row_number().over(w))
        .where(F.col("_cap_rk") <= n)
        .drop("_cap_rk")
    )


def dsir_logratio_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by the mean log2 likelihood ratio of its tokens under the
    TARGET distribution vs the RAW distribution, both unigram models
    with add-1 smoothing over the raw vocabulary. Sampling raw docs
    proportionally to exp(weight) then approximates sampling from the
    target domain — the standard recipe for tilting a web-scale corpus
    toward a curated domain (Wikipedia, books, code).

    Returns (id, n_tokens, logratio): logratio > 0 means the doc looks
    more target-like than the corpus average.

    Scale shape: two token hash-aggs build the models (raw vocab +
    target vocab); the merged model is vocabulary-sized, so it
    BROADCASTS back onto the raw token stream and scoring is a map-side
    join + one per-doc agg. The 100 TB corpus is scanned twice and
    shuffled once (the vocab agg on the high-cardinality token key —
    well spread); the target sample is small by construction. Tokens
    outside the raw vocabulary cannot occur (raw defines the stream);
    target-unseen tokens get the +1 smoothing mass.
    """
    tok = docs.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("t"))
    tgt_tok = target.select(F.explode(tokens(text_col)).alias("t"))
    raw_cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt_raw"))
    tgt_cnt = tgt_tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt_tgt"))
    model = raw_cnt.join(tgt_cnt, "t", "left").na.fill({"cnt_tgt": 0})
    sums = model.agg(
        F.sum("cnt_raw").alias("tot_raw"),
        F.sum("cnt_tgt").alias("tot_tgt"),
        F.count(F.lit(1)).alias("vocab"),
    )
    scored = model.crossJoin(F.broadcast(sums)).withColumn(  # b: 1row
        "lr",
        F.log2(
            (F.col("cnt_tgt") + 1).cast("double") / (F.col("tot_tgt") + F.col("vocab"))
        )
        - F.log2(
            (F.col("cnt_raw") + 1).cast("double") / (F.col("tot_raw") + F.col("vocab"))
        ),
    )
    return (
        tok.join((scored.select("t", "lr")), "t")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            # + 0.0 canonicalizes IEEE negative zero across engines
            (F.round(F.avg("lr"), round_digits) + F.lit(0.0)).alias("logratio"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "logratio")
    )


def budget_select_by_quality(
    docs: DataFrame,
    id_col: str,
    quality_col: str,
    tokens_col: str,
    budget: DataFrame,
    grid: int = 1000,
) -> DataFrame:
    """Select the highest-quality documents whose token counts fit a
    global budget — the "give me the best 60%-of-tokens slice" curation
    step — WITHOUT a global sort. Quality is quantized onto an integer
    grid (``round(quality * grid)``); per-bucket token sums (at most
    ``grid + 1`` rows) are cumulated highest-bucket-first to find the
    boundary bucket; buckets strictly above it are kept by pure FILTER,
    and only the boundary bucket is ordered (by ``id_col``) to take the
    prefix that tops the budget off. ``budget`` is a 1-row frame with a
    long ``_budget`` column (so "60% of total tokens" stays a lazy agg —
    no driver collect). Returns ``docs`` plus a boolean ``kept`` flag.

    Scale shape: one hash agg to the tiny bucket frame; the cumsum runs
    on <= grid+1 rows via a single-partition window — bounded by the
    GRID, not the data. The two threshold scalars broadcast back, so the
    keep decision is a map-side filter for every bucket except the
    boundary one, which alone is ordered (a window over one bucket's
    rows). At 100 TB tighten ``grid`` if that bucket grows too hot
    (finer grid => smaller buckets). All integer/long arithmetic, so
    engines agree exactly.
    """
    d = docs.withColumn("_bk", F.round(F.col(quality_col) * grid).cast("long"))
    buckets = d.groupBy("_bk").agg(F.sum(tokens_col).cast("long").alias("_btok"))
    w = Window.orderBy(F.desc("_bk")).rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.withColumn("_cum", F.sum("_btok").over(w)).crossJoin(
        F.broadcast(budget)  # b: 1row
    )
    # boundary = highest bucket whose cumulative sum exceeds the budget
    # (null when everything fits; then every doc is kept)
    bnd = cum.agg(
        F.max(F.when(F.col("_cum") > F.col("_budget"), F.col("_bk"))).alias("_bnd_bk")
    )
    thresholds = (
        bnd.join(cum, F.col("_bnd_bk") == F.col("_bk"), "left")
        .select(
            "_bnd_bk",
            F.coalesce(
                F.col("_budget") - (F.col("_cum") - F.col("_btok")), F.lit(0)
            ).alias("_bnd_room"),
        )
    )
    wb = Window.partitionBy("_bk").orderBy(F.asc(id_col)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        d.crossJoin(F.broadcast(thresholds))  # b: grid
        .withColumn(
            "_run",
            F.when(F.col("_bk") == F.col("_bnd_bk"), F.sum(tokens_col).over(wb)),
        )
        .withColumn(
            "kept",
            F.col("_bnd_bk").isNull()
            | (F.col("_bk") > F.col("_bnd_bk"))
            | ((F.col("_bk") == F.col("_bnd_bk")) & (F.col("_run") <= F.col("_bnd_room"))),
        )
        .drop("_bk", "_bnd_bk", "_bnd_room", "_run")
    )


def jaccard_related_docs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_mod: int = 97,
    k: int = 5,
    tok_frame: Optional[DataFrame] = None,
) -> DataFrame:
    """Token-set Jaccard "more-like-this" retrieval: each query-stratum
    document (``id % query_mod == 0``) ranks the corpus by
    ``|q ∩ d| / |q ∪ d|`` over DISTINCT token sets — the set-overlap
    twin of ``bm25_related_docs`` (frequency-weighted) used as the
    second system in hybrid rank fusion.

    Scale shape: one distinct (doc, token) explode (checkpointed so the
    set-size reduction reuses it), a thin query slice equi-joined on
    ``token`` (bounded by |queries| x posting length — the query stratum
    is a ``1/query_mod`` sample, so the candidate frame is linear in the
    corpus per query, never all-pairs), set sizes joined back on the id
    keys. Jaccard here is EXACT, so no df ceiling is applied (dropping
    a common token would change the intersection); at 100 TB cap recall
    loss-free with PPJoin prefix filtering (see ``dedupe.py``'s
    containment join) rather than a frequency cut.

    Returns (query_id, id_col, rank, jaccard); rank by 1e-6-rounded
    jaccard then id.
    """
    if tok_frame is not None:
        # Caller-provided DISTINCT (id, token) stream. A (id, token, tf)
        # term-frequency table projected to its keys is exactly this
        # frame (groupBy keys are distinct), so the hybrid-RRF stack
        # derives it from the shared tf store with zero extra shuffles.
        tok = tok_frame.select(F.col(id_col), F.col("token"))
    else:
        tok = (
            docs.select(
                F.col(id_col),
                F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
            )
            .localCheckpoint(eager=False)
        )
    sz = tok.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("_sz"))
    q = (
        tok.where((F.col(id_col) % query_mod) == 0)
        .select(F.col(id_col).alias("query_id"), "token")
    )
    inter = (
        tok.join(q, "token")
        .where(F.col("query_id") != F.col(id_col))
        .groupBy("query_id", id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_inter"))
    )
    qsz = sz.select(F.col(id_col).alias("query_id"), F.col("_sz").alias("_qsz"))
    jac = (
        inter.join((qsz.where((F.col("query_id") % query_mod) == 0)), "query_id")
        .join(sz, id_col)
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter") / (F.col("_qsz") + F.col("_sz") - F.col("_inter")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jaccard"), F.asc(id_col))
    return (
        jac.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "jaccard")
    )


def rrf_fuse(
    rankings: Dict[str, DataFrame],
    id_col: str = "doc_id",
    rrf_k: int = 60,
    k: int = 5,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke 2009) of N retrieval
    systems: every (query, doc) pair scores ``sum over systems of
    1 / (rrf_k + rank_sys)`` for the systems that retrieved it, and the
    fused list re-ranks by that score. The standard score-free way to
    combine lexical (BM25) and set/vector rankings — no calibration of
    incomparable score scales, just ranks.

    ``rankings`` maps system name -> DataFrame(query_id, id_col, rank).
    Returns (query_id, id_col, rank, rrf_score, <name>_rank per system;
    0 when that system did not retrieve the pair).

    Scale shape: a union of already-top-k'd (thin) ranking frames, ONE
    hash agg on (query_id, id), and a per-query top-k window — the
    fusion never touches the corpus, only the k*N retrieved rows per
    query. Determinism: each pair folds <= N reciprocal terms (tiny,
    exact-order-independent at the 1e-6 rounding), tie-break by id.
    """
    parts = [
        df.select(
            "query_id",
            F.col(id_col),
            F.col("rank").cast("long").alias("_r"),
            F.lit(name).alias("_sys"),
        )
        for name, df in rankings.items()
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    aggs = [
        F.round(F.sum(1.0 / (F.lit(rrf_k) + F.col("_r"))), 6).alias("rrf_score")
    ]
    for name in rankings:
        aggs.append(
            F.coalesce(
                F.max(F.when(F.col("_sys") == name, F.col("_r"))), F.lit(0)
            )
            .cast("long")
            .alias(f"{name}_rank")
        )
    fused = u.groupBy("query_id", id_col).agg(*aggs)
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc(id_col))
    return fused.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= k
    )


def suffix_ranks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 32,
) -> DataFrame:
    """Distributed suffix ranking by PREFIX DOUBLING (Manber-Myers), the
    suffix-array construction that powers exact-substring dedup of
    training corpora (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): every (doc, pos) suffix gets the dense
    rank of its first ``window`` characters in O(log window) rounds —
    each round doubles the compared span by re-ranking the PAIR
    (rank[pos], rank[pos + span]).

    The scale discipline per round: the (rank[pos], rank[pos+span])
    pair is a ``lead(rank, span)`` window per doc — positions are the
    contiguous 1..len(doc) integers by construction, so the lead IS the
    +span self-join, for one exchange of the position frame instead of
    the sort-merge join's two (r11 rewrite; the window sort is by the
    in-doc position, never a global sort). The pair frame groups to its
    DISTINCT pairs (the alphabet of the next round — contracts fast),
    the distinct frame gets an exact dense rank via the range-exchange
    + offset-map pattern (operators/ranking.global_row_number — a
    sampled range partition, never a single-task sort), and positions
    re-join their new rank by pair key. Per-round intermediates are
    LAZY checkpoints — the rank map's own materialization job pulls
    them through, so a round costs two jobs, not three.

    Returns (``id_col``, pos, rank) with pos 1-based and rank the dense
    rank of the suffix's first ``window`` chars under binary collation
    — identical to ``dense_rank() OVER (ORDER BY substr(text, pos,
    window))``, which is the oracle's one-liner and the proof the
    doubling is right. ``window`` must be a power of two.
    """
    from .ranking import global_row_number

    if window & (window - 1):
        raise ValueError(f"window={window} must be a power of two")

    chars = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.col(text_col), "")).alias("_pos0", "_ch"),
    ).where(F.col("_ch") != "")
    pos = chars.select(
        "_doc",
        (F.col("_pos0") + 1).alias("_pos"),
        F.ascii("_ch").cast("long").alias("_r"),
    ).localCheckpoint(eager=True)

    span = 1
    wdoc = Window.partitionBy("_doc").orderBy("_pos")
    while span < window:
        # Positions are contiguous 1..len per doc, so the row `span`
        # ahead in position order IS position+span: lead() replaces the
        # (_doc, _pos) sort-merge self-join. SKEW BOUND this assumes
        # (ADVICE r11): the lead window partitions by _doc only, so ONE
        # document's whole position frame lands on a single task — fine
        # for document-sized texts (the pipeline's unit), but a multi-GB
        # single document would need sub-bucketing into contiguous
        # position ranges with a boundary fix-up; the old equi-join
        # hashed on (_doc, _pos) and did not have this bound.
        # Lazy checkpoint: `paired` feeds both the alphabet and the rank
        # re-join; global_row_number's counts collect materializes it
        # (and the previous round's pos) in the same job, so the window
        # runs once per round. (An r12 attempt to fold the distinct into
        # a full-frame dense rank measured WORSE — the _pid window
        # re-exchanges the full frame; see OPTIMIZATION_r12.md §7.)
        paired = pos.select(
            "_doc",
            "_pos",
            "_r",
            F.coalesce(F.lead("_r", span).over(wdoc), F.lit(-1)).alias("_r2"),
        ).localCheckpoint(eager=False)
        alphabet = paired.select("_r", "_r2").distinct()
        ranked, _ = global_row_number(alphabet, ["_r", "_r2"], "_nr")
        # (r11 measured: an explicit gated broadcast of the rank map here
        # changed NOTHING — identical stages/shuffle bytes; AQE already
        # rewrites this join to broadcast at runtime because the rank map
        # comes out of a materialized exchange with exact sizes. The
        # iterative-graph operators need the hint only because their
        # checkpointed frames hide sizes from the planner.)
        pos = (
            paired.join(ranked, ["_r", "_r2"])
            .select("_doc", "_pos", F.col("_nr").alias("_r"))
            .localCheckpoint(eager=False)
        )
        span *= 2
    return pos.select(
        F.col("_doc").alias(id_col),
        F.col("_pos").cast("long").alias("pos"),
        F.col("_r").cast("long").alias("rank"),
    )

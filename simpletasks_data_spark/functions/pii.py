"""PII detection/redaction and tokenizer-style counting for corpus prep.

All map-only native Column expressions (single scan, no shuffle — the
100 TB shape for scrubbing is embarrassingly parallel). Patterns are kept
to the regex subset that Java (Spark) and RE2 (DuckDB oracles) interpret
identically: no lookaround, no backreferences, ASCII classes only.

Reference scope note: the reference engine has no PII surface — this is
part of the training-data-pipeline extension set (corpus scrubbing before
tokenization), alongside dedup and quality filtering.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "pii_counts",
    "redact",
    "BPE_ISH_PATTERN",
    "bpe_ish_token_count",
]

# Ordered: redaction applies email first so its digits/dots are gone
# before the phone/IP passes (an email's host can contain digit runs).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # TPC-H style dd-ddd-ddd-dddd plus common 3-3-4 groupings.
    "phone": r"\d{2,3}[- ]\d{3}[- ]\d{3,4}[- ]?\d{0,4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts ({'email': Column, ...}), for filtering docs
    by PII density before the (more expensive) redaction pass."""
    c = _c(col)
    return {k: F.regexp_count(c, F.lit(p)) for k, p in PII_PATTERNS.items()}


def redact(col: Column | str, kinds: tuple[str, ...] = ("email", "phone", "ipv4")) -> Column:
    """Replace each PII match with an ``[KIND]`` placeholder, in the fixed
    PII_PATTERNS order (email before phone before ip)."""
    c = _c(col)
    for k in PII_PATTERNS:
        if k in kinds:
            c = F.regexp_replace(c, PII_PATTERNS[k], f"[{k.upper()}]")
    return c


# GPT-2-style pre-tokenizer, restricted to the lookaround-free subset:
# contraction suffixes, letter runs, digit runs, punctuation runs.
# Whitespace is a separator, not a token. Counting matches of this
# pattern approximates BPE token counts to within the per-run merge
# factor — good enough for corpus sizing/budgeting, and exactly
# reproducible in SQL (DuckDB: len(regexp_extract_all(text, pattern))).
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s']+|'"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Pre-tokenizer match count as a BPE-token-count proxy (whitespace
    tokenization undercounts punctuation-heavy text; this splits letter,
    digit, and symbol runs the way GPT-2's pre-tokenizer does)."""
    return F.regexp_count(_c(col), F.lit(BPE_ISH_PATTERN))

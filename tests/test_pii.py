"""PII redaction and BPE-ish token counting: hand-checked examples,
including the redaction-order guarantee (email before phone before IP)
and the bare-apostrophe case in the pre-tokenizer pattern."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.functions import pii as PII  # noqa: E402


def _one(spark, text, *cols):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(*cols).first()


def test_redact_all_kinds(spark):
    r = _one(
        spark,
        "mail a.b+c@ex-ample.org call 12-345-678-9012 from 192.168.0.1 now",
        PII.redact("t").alias("r"),
    )
    assert r["r"] == "mail [EMAIL] call [PHONE] from [IPV4] now"


def test_counts_and_no_false_positives(spark):
    row = _one(
        spark,
        "x@y.io and admin@corp.example.org but not version 1.2 or 12-34",
        *[c.alias("n_" + k) for k, c in PII.pii_counts("t").items()],
    )
    assert (row["n_email"], row["n_phone"], row["n_ipv4"]) == (2, 0, 0)


def test_bpe_count_splits_runs(spark):
    # "don't" -> don + 't ; "v1.2-beta!" -> v + 1 + . + 2 + - + beta + !
    # (punct runs collapse: "." and "-" and "!" are separate runs split by
    # alnum) ; trailing bare apostrophe counts once.
    r = _one(
        spark,
        "don't stop v1.2!! twins'",
        PII.bpe_ish_token_count("t").alias("n"),
        F.regexp_count("t", F.lit(r"\S+")).alias("ws"),
    )
    # don|'t|stop|v|1|.|2|!!|twins|'  = 10
    assert r["n"] == 10
    assert r["ws"] == 4

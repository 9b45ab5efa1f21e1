"""Randomized roundtrip fuzz for the non-CSV file sources (JSONL, XML,
fixed-width) — same discipline as test_csv_fuzz: the oracle is the
original in-memory random table, serialized with an INDEPENDENT writer
(json.dumps / saxutils.escape / manual space-padding), read back through
the Source contract, and compared cell-for-cell. Pins schema-declared
reads, SRC_POS synthesis, escaping, padding/trim conventions, and the
documented empty-vs-NULL normalizations across arbitrary unicode."""

import json
import os
import random
import sys
from xml.sax.saxutils import escape

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from simpletasks_data_spark.mapping import Mapping  # noqa: E402
from simpletasks_data_spark.sources.base import SRC_POS  # noqa: E402
from simpletasks_data_spark.sources.fixedwidth import FixedWidthSource  # noqa: E402
from simpletasks_data_spark.sources.jsonl import JsonlSource  # noqa: E402
from simpletasks_data_spark.sources.xml import XmlSource  # noqa: E402

JSON_ALPHABET = list("ab\"\\\n\t é∆09'{}[],:") + ["", "💡"]
XML_ALPHABET = list("ab&<>\"' é∆09,\n") + ["💡"]  # no control chars (invalid XML 1.0)
FW_ALPHABET = list("abé∆09.,'")  # no spaces: padding owns the space semantics


def _rand_str(rng, alphabet, lo=0, hi=10):
    return "".join(rng.choice(alphabet) for _ in range(rng.randrange(lo, hi)))


def test_jsonl_roundtrip_fuzz(spark, tmp_path):
    rng = random.Random(4242)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    for trial in range(6):
        rows = [
            (
                i,
                None if rng.random() < 0.1 else _rand_str(rng, JSON_ALPHABET),
                None if rng.random() < 0.1 else rng.uniform(-1e6, 1e6),
            )
            for i in range(rng.randrange(1, 15))
        ]
        p = tmp_path / f"j{trial}.jsonl"
        with open(p, "w", encoding="utf-8") as f:
            for i, s, v in rows:
                f.write(json.dumps({"id": i, "s": s, "v": v}) + "\n")
        src = JsonlSource(str(p), Mapping(), schema, order_col="id")
        got = sorted(
            (r["id"], r["s"], r["v"], r[SRC_POS])
            for r in src.load_raw(spark).collect()
        )
        assert got == sorted((i, s, v, i) for i, s, v in rows), trial


def test_xml_roundtrip_fuzz(spark, tmp_path):
    rng = random.Random(777)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    for trial in range(6):
        rows = [
            (i, None if rng.random() < 0.15 else _rand_str(rng, XML_ALPHABET))
            for i in range(rng.randrange(1, 12))
        ]
        p = tmp_path / f"x{trial}.xml"
        with open(p, "w", encoding="utf-8") as f:
            f.write("<root>\n")
            for i, s in rows:
                if s is None:
                    f.write(f"<row><id>{i}</id></row>\n")
                else:
                    f.write(f"<row><id>{i}</id><s>{escape(s)}</s></row>\n")
            f.write("</root>\n")
        src = XmlSource(str(p), Mapping(), schema, row_tag="row", order_col="id")
        got = sorted(
            (r["id"], r["s"]) for r in src.load_raw(spark).collect()
        )
        # spark-xml trims surrounding whitespace of element text (probed:
        # '  padded  ' -> 'padded'); empty element stays '' and a missing
        # element is NULL.
        want = sorted((i, None if s is None else s.strip()) for i, s in rows)
        assert got == want, trial


def test_fixedwidth_roundtrip_fuzz(spark, tmp_path):
    rng = random.Random(999)
    for trial in range(6):
        widths = [rng.randrange(1, 9) for _ in range(rng.randrange(1, 5))]
        rows = []
        for _ in range(rng.randrange(1, 12)):
            rows.append(
                [
                    _rand_str(rng, FW_ALPHABET, 0, w + 1)
                    for w in widths
                ]
            )
        p = tmp_path / f"f{trial}.txt"
        with open(p, "w", encoding="utf-8") as f:
            for r in rows:
                f.write("".join(c.ljust(w) for c, w in zip(r, widths)) + "\n")
        src = FixedWidthSource(str(p), Mapping(), widths)
        n = len(widths)
        got = [
            tuple(r[f"_c{i}"] for i in range(n))
            for r in src.load_raw(spark).orderBy(SRC_POS).collect()
        ]
        # right-trimmed; all-blank field -> NULL (the documented convention)
        want = [tuple(c if c != "" else None for c in r) for r in rows]
        assert got == want, (trial, got, want)

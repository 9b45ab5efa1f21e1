"""URL helpers: parse_url-backed host/path/query extraction and the
registrable-domain approximation (edge cases a crawl pipeline hits)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simpletasks_data_spark.functions import web as W  # noqa: E402


def test_url_parts(spark):
    df = spark.createDataFrame(
        [
            ("https://sub.news.example.co/path/a?lang=fr&x=1",),
            ("http://example.org",),
            ("not a url at all",),
            (None,),
        ],
        "url string",
    )
    got = df.select(
        W.url_host("url").alias("h"),
        W.url_path("url").alias("p"),
        W.url_query_param("url", "lang").alias("q"),
    ).collect()
    assert (got[0].h, got[0].p, got[0].q) == ("sub.news.example.co", "/path/a", "fr")
    assert (got[1].h, got[1].p, got[1].q) == ("example.org", "", None)
    assert got[2].h is None and got[3].h is None


def test_registrable_domain(spark):
    df = spark.createDataFrame(
        [("a.b.example.org",), ("example.org",), ("localhost",), (None,)],
        "h string",
    )
    got = [r.d for r in df.select(W.registrable_domain("h").alias("d")).collect()]
    assert got == ["example.org", "example.org", "localhost", None]

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


def test_canonical_url_rules_and_idempotence(spark):
    from pyspark.sql import functions as F

    from simpletasks_data_spark.functions.web import canonical_url

    cases = [
        # (input, expected canonical)
        ("HTTPS://WWW.Example.COM/A/B/?utm_source=x&b=2&a=1#frag",
         "https://www.example.com/A/B?a=1&b=2"),
        ("http://site.org/", "http://site.org/"),
        ("http://site.org", "http://site.org/"),
        ("http://site.org/x?ref=abc&refresh=1", "http://site.org/x?refresh=1"),
        ("http://site.org/x?fbclid=1&gclid=2&msclkid=3", "http://site.org/x"),
        ("http://site.org/p//", "http://site.org/p"),
        # non-default port is a DISTINCT resource — must survive
        ("http://Site.ORG:8080/x", "http://site.org:8080/x"),
        ("http://site.org:8080/x?utm_b=1", "http://site.org:8080/x"),
        # userinfo kept verbatim (case-sensitive), host:port folded
        ("http://User@Site.ORG:81/x", "http://User@site.org:81/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["c"] for r in df.select(canonical_url("u").alias("c")).collect()]
    assert got == [e for _, e in cases]
    # idempotence: canonicalizing a canonical url is a no-op
    df2 = spark.createDataFrame([(c,) for c in got], "u string")
    got2 = [r["c"] for r in df2.select(canonical_url("u").alias("c")).collect()]
    assert got2 == got

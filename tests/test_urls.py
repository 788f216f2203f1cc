"""Pins for mlops/urls.py: canonicalization golden cases + dedup shape."""

from pyspark.sql import functions as F

from auth2wd_spark.mlops.urls import canonicalize_urls, url_dedup

GOLDEN = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM:80/a/b/?b=2&utm_source=x&a=1#frag", "http://example.com/a/b?a=1&b=2"),
    ("https://Example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),  # non-default port kept
    ("http://example.com", "http://example.com/"),  # empty path → /
    ("http://example.com/?fbclid=abc&gclid=1", "http://example.com/"),  # all params tracked
    ("http://example.com/p?z=1&a=2", "http://example.com/p?a=2&z=1"),  # param sort
    ("http://www.example.com/p/", "http://example.com/p"),  # www + trailing slash
    ("ftp://Host.example/Data/", "ftp://host.example/Data"),  # path case preserved
    ("relative/path?x=1#frag", "relative/path?x=1"),  # scheme-less: fragment-strip passthrough
    # empty authority: host+path regexes can't represent it — passthrough,
    # never the degenerate "file:///" collapse that would weld distinct docs
    ("file:///data/a.txt#sec", "file:///data/a.txt"),
    ("file:///data/b.txt", "file:///data/b.txt"),
]


def test_canonical_url_golden(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(GOLDEN)], "doc_id long, url string"
    )
    got = {r["doc_id"]: r["canonical_url"] for r in canonicalize_urls(df).collect()}
    for i, (raw, want) in enumerate(GOLDEN):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonicalize_shuffle_free(spark):
    df = spark.createDataFrame([(1, "http://a.com/")], "doc_id long, url string")
    plan = canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_url_dedup_keeps_min_id(spark):
    rows = [
        (3, "http://example.com/p?a=1"),
        (1, "HTTP://WWW.EXAMPLE.COM:80/p/?utm_source=x&a=1"),
        (2, "http://other.com/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert out["http://example.com/p?a=1"]["keep_doc_id"] == 1
    assert out["http://example.com/p?a=1"]["n_copies"] == 2
    assert out["http://other.com/"]["n_copies"] == 1

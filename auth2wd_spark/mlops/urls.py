"""URL canonicalization + URL-level dedup for web-crawl corpora.

A crawl's frontier sees the same page under many spellings — scheme/host
case, default ports, `www.`, tracking params, param order, trailing
slash, fragments. Canonicalizing before (or instead of) content-hash
dedup removes re-fetch duplicates at zero text cost: this runs on the
URL column alone, long before anything reads page bytes.

Everything here is JVM-side string/regex/array expressions inside
whole-stage codegen — zero Python, zero shuffle for the canonical form
itself; the dedup is one hash aggregation (map-side combinable). The
regexes are RE2-safe so DuckDB replays them verbatim for the oracle
(`url_dedup` in __spark_entry__.py).

Canonical form (a pragmatic subset of RFC 3986 §6 normalization plus the
crawl-dedup conventions used by e.g. CommonCrawl URL indexes):
  1. drop the fragment;
  2. lowercase scheme and host; strip a leading `www.`;
  3. strip default ports (`:80` for http, `:443` for https);
  4. empty path → `/`; strip one trailing slash from non-root paths;
  5. drop tracking params (utm_*, fbclid, gclid, ref, mc_cid, mc_eid),
     sort the survivors byte-wise, drop the `?` if none survive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# params that never identify content (ad/mail-campaign trackers)
TRACKING_PARAM_REGEX = r"^(utm_[a-z]+|fbclid|gclid|ref|mc_cid|mc_eid)="


def canonical_url(url: Column) -> Column:
    """Canonical form of one URL column (pure expression, no shuffle)."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host_port = F.lower(F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host_port = F.regexp_replace(host_port, r"^www\.", "")
    # default ports only; other ports are significant
    host_port = F.when(
        scheme == "http", F.regexp_replace(host_port, r":80$", "")
    ).otherwise(
        F.when(scheme == "https", F.regexp_replace(host_port, r":443$", "")).otherwise(
            host_port
        )
    )
    path = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path == "/", path).otherwise(F.regexp_replace(path, r"/$", ""))
    query = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
        )
    )
    qpart = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    # a relative/scheme-less string is not a canonicalizable absolute URL,
    # and neither is an empty-authority one (file:///path — the host regex
    # requires ≥1 char, so host AND path would extract empty and every
    # such URL would collapse to "scheme:///", silently deduping distinct
    # documents): pass both through fragment-stripped rather than emitting
    # a degenerate form (crawl frontiers resolve relative hrefs and only
    # enqueue http(s) BEFORE this point)
    return F.when((scheme == "") | (host_port == ""), no_frag).otherwise(
        F.concat(scheme, F.lit("://"), host_port, path, qpart)
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append `canonical_url` to `df` (no shuffle)."""
    return df.withColumn("canonical_url", canonical_url(F.col(url_col)))


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per canonical URL: (canonical_url, keep_doc_id,
    n_copies). One hash aggregation — the same shape as exact_dedup, so it
    scales identically (map-side combine, shuffle only of distinct URLs)."""
    return (
        canonicalize_urls(df, url_col)
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )

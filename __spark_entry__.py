"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator inventory over the driver's
TPC-H-ish tables (FIXTURES.md §6): each entry exercises the same Spark
primitive the KG pipeline uses (SURVEY.md §2 inventory), plus the
training-data operators (dedup / similarity / text analysis) on the
``documents`` and ``embeddings`` tables. ``oracle_sql()`` gives the DuckDB
equivalent; outputs use only ints/strings (or exact decimals) so the
driver's value-hash comparison is type-stable.

Every query has an oracle entry: the hash-defined operators
(MinHash-LSH, SimHash, SRP-LSH) use portable md5 variants DuckDB can
replay, iterative CC is checked against a recursive CTE, and the
multimodal query is oracled on its decoder-independent payload facts
(byte length + sha256).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _t(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read a driver table; ``spread=True`` fixes under-parallel scans.

    Round 6: every driver table is ONE parquet file with ONE row group,
    and a parquet scan cannot split below a row group — so a query's
    leaf stage (scan plus everything codegen fuses above it: tokenize,
    md5, explodes, per-row array math) ran in a SINGLE task while the
    other cores idled (measured: the duplicate_spans gram-hash stage
    2.4 s one-task → 0.4 s spread). This is the guide §2.5 input-skew
    fix — "one huge unsplittable file: repartition immediately after
    the read". Opt-in per query because the round-robin exchange costs
    more than the whole plan of the cheap scan+agg queries (measured:
    broadcast_link 0.40 → 2.15 s when spread indiscriminately); only
    queries whose leaf stage does heavy per-row work ask for it. The
    spread is additionally gated on file size so it is layout-driven,
    not a local tuning constant: a table big enough that the normal
    split machinery already feeds the session's parallelism (≥ cores ×
    the 128 MB default split) is returned as-is — at warehouse scale
    the branch never fires.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if not spread:
        return df
    par = spark.sparkContext.defaultParallelism
    try:
        size = os.path.getsize(path) if os.path.isfile(path) else sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    except OSError:
        return df
    if size < par * 128 * 1024 * 1024:
        df = df.repartition(par * 2)
    return df


# per-sf_dir dropped-doc counts already logged by q_ngram_jaccard_pairs.
# Process-lifetime cache: driver testdata dirs are immutable; a corpus
# regenerated IN-PROCESS at the same path would reuse the stale count
# (accepted — the alternative is re-scanning on every query build).
_NGRAM_DROP_LOGGED: dict[str, int] = {}


# ---------------------------------------------------------------------------
# KG-primitive analogs (SURVEY §2) on the TPC-H-ish tables
# ---------------------------------------------------------------------------

def q_route_url2extid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 / S-router: ordered first-match regex URL → (property, id).

    Synthesizes authority URLs from customer keys (3 shapes + noise) and
    extracts property/id with JVM-side regexes — the routing primitive.
    """
    c = _t(spark, sf_dir, "customer")
    url = (
        F.when(F.col("c_custkey") % 4 == 0, F.concat(F.lit("https://viaf.org/viaf/"), F.col("c_custkey")))
        .when(F.col("c_custkey") % 4 == 1, F.concat(F.lit("https://d-nb.info/gnd/"), F.col("c_custkey")))
        .when(F.col("c_custkey") % 4 == 2, F.concat(F.lit("https://www.idref.fr/"), F.col("c_custkey")))
        .otherwise(F.concat(F.lit("https://example.org/"), F.col("c_custkey")))
    )
    d = c.select(F.col("c_custkey").alias("custkey"), url.alias("url"))
    prop = (
        F.when(F.regexp_like("url", F.lit(r"^https://viaf\.org/viaf/\d+$")), F.lit(214))
        .when(F.regexp_like("url", F.lit(r"^https://d-nb\.info/gnd/\d+$")), F.lit(227))
        .when(F.regexp_like("url", F.lit(r"^https://www\.idref\.fr/\d+$")), F.lit(269))
    )
    return (
        d.withColumn("property", prop.cast("int"))
        .withColumn("ext_id", F.regexp_extract("url", r"/(\d+)$", 1))
        .filter(F.col("property").isNotNull())
        .select("custkey", "property", "ext_id")
    )


def q_dedup_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3: claim dedup with reference union — groupBy claim key, count
    duplicates folded, distinct sources collected as reference count."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup"),
            F.countDistinct("l_suppkey").cast("long").alias("n_refs"),
        )
        .filter(F.col("n_dup") > 1)
    )


def q_single_hit_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: accept a mapping only on exactly one hit (totalhits==1)."""
    o = _t(spark, sf_dir, "orders")
    single = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.min("o_orderkey").alias("orderkey"))
        .filter(F.col("n") == 1)
    )
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(single), c["c_custkey"] == single["o_custkey"])
        .select(F.col("c_custkey").alias("custkey"), F.col("orderkey"))
    )


def q_precision_demotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6 fix_dates: demote below-max 'precision' per group (window max)."""
    e = _t(spark, sf_dir, "events")
    prec = (F.col("event_id") % 3 + 9).cast("int")
    w = Window.partitionBy("user_id")
    d = e.select(F.col("event_id"), F.col("user_id"), prec.alias("precision"))
    return d.select(
        "event_id",
        "user_id",
        "precision",
        F.when(F.col("precision") < F.max("precision").over(w), F.lit("deprecated"))
        .otherwise(F.lit("normal"))
        .alias("rank"),
    )


def q_first_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/A12: first-wins label per language (row_number window)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("c_nationkey").alias("nationkey"), F.col("c_name").alias("label"))
    )


def q_broadcast_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J4 linking join: fact × broadcast dimension + aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            # quantities are integer-valued in the driver data; BIGINT output
            # keeps the driver's value hash type-stable vs DuckDB SUM widening
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
        )
    )


def q_rescue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 typed rescue: resolve parked text against a class-constrained dim;
    unmatched rows stay parked (left join + null bucket)."""
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") <= 2)  # class constraint
    c = _t(spark, sf_dir, "customer")
    oc = o.join(c, o["o_custkey"] == c["c_custkey"])
    j = oc.join(F.broadcast(n), oc["c_nationkey"] == n["n_nationkey"], "left")
    return j.select(
        F.col("o_orderkey").alias("orderkey"),
        F.coalesce(F.col("n_name"), F.lit("UNRESOLVED")).alias("resolved"),
    )


def q_merge_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 MergeDiff: added statements = merged claims minus base claims
    (anti-join on the claim key)."""
    o = _t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        o.join(base, "o_orderkey", "left_anti")
        .select(F.col("o_orderkey").alias("orderkey"), F.col("o_orderstatus").alias("status"))
    )


def q_date_precision_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 parse_date: year/month/day forms → wikibase time + precision."""
    o = _t(spark, sf_dir, "orders")
    ymd = F.date_format("o_orderdate", "yyyy-MM-dd")
    ym = F.date_format("o_orderdate", "yyyy-MM")
    y = F.date_format("o_orderdate", "yyyy")
    s = (
        F.when(F.col("o_orderkey") % 3 == 0, y)
        .when(F.col("o_orderkey") % 3 == 1, ym)
        .otherwise(ymd)
    )
    d = o.select(F.col("o_orderkey").alias("orderkey"), s.alias("raw"))
    prec = (
        F.when(F.length("raw") == 4, 9).when(F.length("raw") == 7, 10).otherwise(11)
    )
    # normalize to +YYYY-MM-DDT00:00:00Z with -00 padding for missing parts
    time = F.concat(
        F.lit("+"),
        F.substring("raw", 1, 4),
        F.lit("-"),
        F.when(F.length("raw") >= 7, F.substring("raw", 6, 2)).otherwise(F.lit("00")),
        F.lit("-"),
        F.when(F.length("raw") == 10, F.substring("raw", 9, 2)).otherwise(F.lit("00")),
        F.lit("T00:00:00Z"),
    )
    return d.select("orderkey", time.alias("wb_time"), prec.cast("int").alias("precision"))


def q_label_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 'Last, First' → 'First Last' (exactly one ', ' split)."""
    c = _t(spark, sf_dir, "customer")
    name = F.concat(F.col("c_name"), F.lit(", "), F.col("c_mktsegment"))
    d = c.select(F.col("c_custkey").alias("custkey"), name.alias("raw"))
    parts = F.split("raw", ", ")
    flipped = F.when(
        F.size(parts) == 2, F.concat(parts[1], F.lit(" "), parts[0])
    ).otherwise(F.col("raw"))
    return d.select("custkey", flipped.alias("label"))


def q_cc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 connected components over a bipartite order↔part edge slice —
    our iterative min-label-propagation operator; oracle = recursive CTE."""
    from auth2wd_spark.operators.cc import connected_components

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    edges = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    ).distinct()
    labels = connected_components(edges, max_iter=30)
    return labels.select(F.col("node"), F.col("component"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-analog sessionization: 30-min-gap sessions per user via
    lag + cumulative sum windows (the batch shape of the streaming op)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional epoch seconds (µs-exact); TIMESTAMP_NTZ needs the 2-step cast
    epoch = F.col("ts").cast("timestamp").cast("double")
    prev = F.lag(epoch).over(w)
    gap = F.when(prev.isNull() | ((epoch - prev) > 1800), 1).otherwise(0)
    d = e.withColumn("new_session", gap)
    d = d.withColumn("session_id", F.sum("new_session").over(w))
    return d.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan → filter → hash agg with exact decimals
    (column pruning + pushdown demonstration)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            # BIGINT outputs (qty is integer-valued, price is cent-valued in
            # the driver data) so the value hash is type-stable vs DuckDB
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("sum_base_price_cents"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators (documents / embeddings)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on document text."""
    d = _t(spark, sf_dir, "documents", spread=True)
    return (
        d.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokens) per source."""
    d = _t(spark, sf_dir, "documents", spread=True)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.groupBy(F.col("source")).agg(
        F.sum(n_tokens.cast("long")).alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length + mean-word-length + short-doc flag (ints)."""
    d = _t(spark, sf_dir, "documents", spread=True)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return d.select(
        F.col("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars_out"),
        n_tokens.alias("n_tokens"),
        (F.col("n_chars").cast("long") * F.lit(10) / F.greatest(n_tokens, F.lit(1)))
        .cast("long")
        .alias("avg_wordlen_x10"),
        F.when(n_tokens < 20, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("too_short"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit count over a fixed English list."""
    d = _t(spark, sf_dir, "documents", spread=True)
    stop = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
    words = F.split(F.trim(F.col("text")), r"\s+")
    hits = F.size(F.filter(words, lambda w: w.isin(*stop))).cast("long")
    return d.select(
        "doc_id",
        hits.alias("stopword_hits"),
        F.when(hits * 100 >= F.size(words) * 5, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("looks_english"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the sorted distinct-token set."""
    d = _t(spark, sf_dir, "documents")
    words = F.array_sort(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")))
    return d.select("doc_id", F.md5(F.array_join(words, " ")).alias("fingerprint"))


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates: distinct-token Jaccard ≥ 0.8 via shingle join —
    the exact quadratic baseline, deliberately bounded to a 2000-doc slice
    (MinHash-LSH below is the scale path for the full corpus). The bound is
    LOUD: one log line names the dropped-doc count when the slice truncates
    (verdict r2 ask #8) — the count is a single narrow-column scan, cached
    per sf_dir so repeated query builds (bench reps, oracle runs) pay it
    once."""
    full = _t(spark, sf_dir, "documents", spread=True)
    if sf_dir not in _NGRAM_DROP_LOGGED:
        _NGRAM_DROP_LOGGED[sf_dir] = full.filter(F.col("doc_id") >= 2000).count()
        if _NGRAM_DROP_LOGGED[sf_dir]:
            print(
                f"[ngram_jaccard_pairs] exact-quadratic baseline truncated: "
                f"{_NGRAM_DROP_LOGGED[sf_dir]} docs beyond the 2000-doc slice "
                f"dropped (use minhash_lsh for full-corpus near-dup)",
                file=sys.stderr,
            )
    d = full.filter(F.col("doc_id") < 2000)
    # round 6: same result, different plan. The old shape exploded tokens
    # and self-joined on the token (62M intermediate rows on the 31-word
    # bench vocabulary, then a 2M-key hash agg — 13.8 s driver-min). The
    # slice is bounded at 2000 docs BY CONTRACT (this is the labeled exact
    # quadratic baseline), so the doc-pair space is ≤2M pairs: broadcast
    # the per-doc distinct-token ARRAYS (a few MB) through a nested-loop
    # inequality join and compute each pair's intersection size with one
    # codegen'd array_intersect — no token shuffle, no pair-keyed agg.
    # n_shared = |distinct(A) ∩ distinct(B)| identically; pairs sharing no
    # token fail inter > 0 exactly as they produced no join row before.
    words = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    docs = d.select("doc_id", words.alias("toks"), F.size(words).alias("sz"))
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"), F.col("sz").alias("sz_a")
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"), F.col("sz").alias("sz_b")
    )
    # the stream side of a nested-loop join does ALL the pair work — the
    # spread read (see _t) keeps it at the session's parallelism
    pairs = F.broadcast(a).join(b, F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        pairs.select("doc_a", "doc_b", inter.alias("inter"), "sz_a", "sz_b")
        .filter(
            (F.col("inter") > 0)
            & (F.col("inter") * 10 >= (F.col("sz_a") + F.col("sz_b") - F.col("inter")) * 8)
        )
        .select("doc_a", "doc_b", F.col("inter").cast("long").alias("n_shared"))
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 perms) + LSH banding (4 bands) candidate pairs.

    Uses the PORTABLE md5 hash variant so DuckDB can replay the exact
    min-hash signatures and band buckets — fully oracled (the engine
    default stays xxhash64 for speed)."""
    from auth2wd_spark.mlops.dedup import minhash_lsh_candidates

    d = _t(spark, sf_dir, "documents", spread=True)
    return minhash_lsh_candidates(d, n_hashes=16, n_bands=4, hash_fn="md5")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint per document (60-bit portable md5 variant —
    DuckDB-oracled; engine default stays 64-bit xxhash64)."""
    from auth2wd_spark.mlops.dedup import simhash

    d = _t(spark, sf_dir, "documents")
    return simhash(d, hash_fn="md5")


def q_ann_cosine_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-1 neighbor for the first 10 vectors
    (JVM-side F.aggregate/zip_with dot products, no Python in the loop)."""
    from auth2wd_spark.mlops.simsearch import brute_force_topk

    e = _t(spark, sf_dir, "embeddings", spread=True)
    q = e.filter(F.col("vec_id") < 10)
    return brute_force_topk(q, e, k=1).select("query_id", "neighbor_id")


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew defense: two-phase salted aggregation — partial agg on
    (key, salt), final agg on key. Result identical to a plain GROUP BY
    (the oracle), which is exactly the point."""
    e = _t(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(16))
    partial = (
        e.withColumn("salt", salt)
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("n_part"),
            # cent-valued doubles → exact BIGINT cents (type-stable hash)
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_part"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("n_part").cast("long").alias("n_events"),
        F.sum("sum_part").cast("long").alias("sum_value_cents"),
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection: plant scaled copies (cosine≈1.0
    to their source vector) of the first 25 vectors, then find each planted
    vector's ≥0.99-cosine neighbor via exact top-1. The random corpus tops
    out near cosine 0.6 at dim 64, so the planted pair is the unambiguous
    argmax — deterministic, non-vacuous, and DuckDB-oracled."""
    from auth2wd_spark.mlops.simsearch import brute_force_topk

    e = _t(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = e.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.5).alias("embedding"),
    )
    allv = e.union(planted)
    q = allv.filter(F.col("vec_id") >= 1000000)
    top = brute_force_topk(q, allv, k=1)
    return top.filter(F.col("cosine") >= 0.99).select("query_id", "neighbor_id")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: documents' text re-encoded as opaque binary
    payloads → Arrow-batched feature extraction. The n_bytes/sha256 outputs
    are payload-exact and DuckDB-replayable (octet_length/sha256 over the
    same utf-8 bytes), so the Spark-side binary plumbing is fully oracled
    even though the feature vector itself is decoder-dependent."""
    from auth2wd_spark.mlops.multimodal import extract_features
    from auth2wd_spark.session import ship_package

    ship_package(spark)  # executors must import the package for the UDF
    # null-text symmetry with the oracle: DuckDB's sha256/octet_length
    # return NULL for NULL text while the kernel hashes b"" — exclude both
    d = _t(spark, sf_dir, "documents", spread=True).filter(F.col("text").isNotNull())
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return extract_features(media).select("media_id", "n_bytes", "sha256")


def q_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling PLAN (JVM-side sequence + explode, zero payload
    touch): derive deterministic video-row metadata from documents
    (every 5th doc is a video; duration keyed off doc_id), then one output
    row per every_ms-spaced timestamp. This is the metadata half of the
    multimodal frame sampler — `sample_frames` (mlops/multimodal.py)
    executes the same spacing against real MJPEG-AVI payload bytes."""
    from auth2wd_spark.mlops.multimodal import frame_sample_plan

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("video/x-msvideo"))
        .otherwise(F.lit("image/png"))
        .alias("mime"),
        ((F.col("doc_id") % 7) * 900 + 500).cast("int").alias("duration_ms"),
    )
    return frame_sample_plan(media, every_ms=1000).select(
        "media_id", F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms")
    )


def q_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal PIXEL path oracled end-to-end: synthesize a
    deterministic grayscale PNG per document (dims and every pixel value
    are integer functions of doc_id), push it through the REAL
    decode → nearest-neighbor resample → PNG re-encode kernel
    (mlops/multimodal.resize_images, max_side=16), then decode the OUTPUT
    payload and report its dimensions plus the exact sum of its pixels.
    DuckDB replays the whole chain in integer math — src pixel for output
    (X, Y) is ((X*w)//tw*7 + (Y*h)//th*13 + doc_id) % 256 — so a single
    wrong byte anywhere in decode, resample, or re-encode flips the hash.

    Payload bytes stay inside the two mapInPandas stages; only bounded
    metadata ints are shuffled or compared (the 100 TB contract)."""
    import pandas as pd

    from auth2wd_spark.mlops import multimodal as mm
    from auth2wd_spark.session import ship_package

    ship_package(spark)
    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id")

    def synth(it):
        cols = [f.name for f in mm.MEDIA_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"].tolist():
                doc_id = int(doc_id)
                w = 3 + (doc_id * 7) % 29
                h = 3 + (doc_id * 11) % 23
                px = bytes(
                    (x * 7 + y * 13 + doc_id) % 256
                    for y in range(h)
                    for x in range(w)
                )
                rows.append(
                    {
                        "media_id": doc_id,
                        "payload": mm._png_encode(w, h, 1, px),
                        "mime": "image/png",
                        "width": w,
                        "height": h,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    media = d.mapInPandas(synth, schema=mm.MEDIA_SCHEMA)
    resized = mm.resize_images(media, max_side=16)

    def verify(it):
        cols = ["media_id", "out_w", "out_h", "resized", "pixel_sum"]
        for pdf in it:
            rows = []
            for media_id, payload, was in zip(
                pdf["media_id"].tolist(), pdf["payload"], pdf["resized"]
            ):
                if payload is None:
                    # degraded row: surface as a sentinel through the normal
                    # oracle comparison instead of a TypeError task failure
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "out_w": -1,
                            "out_h": -1,
                            "resized": None,
                            "pixel_sum": -1,
                        }
                    )
                    continue
                img = mm.decode_png(bytes(payload))
                rows.append(
                    {
                        "media_id": int(media_id),
                        "out_w": img["width"],
                        "out_h": img["height"],
                        "resized": bool(was),
                        "pixel_sum": sum(img["pixels"]),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return resized.mapInPandas(
        verify,
        schema="media_id bigint, out_w bigint, out_h bigint, resized boolean, pixel_sum bigint",
    )


def q_ann_ivf_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (inverted-file lists = nearest-centroid partitions;
    queries probe 2 of 16 lists → ~12.5% of the corpus ranked instead of
    all of it). Centroids are TRAINED: 2 deterministic Lloyd's iterations
    from the first-16 init, with exact integer-quantized mean updates so
    DuckDB replays the identical training AND search (see
    train_centroids_kmeans)."""
    from auth2wd_spark.mlops.simsearch import ivf_ann_topk, train_centroids_kmeans

    e = _t(spark, sf_dir, "embeddings", spread=True)
    q = e.filter(F.col("vec_id") < 10)
    cents = train_centroids_kmeans(e, n_centroids=16, n_iter=2)
    return ivf_ann_topk(q, e, n_probe=2, k=1, centroids=cents).select(
        "query_id", "neighbor_id"
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-band SRP-LSH bucketing (16 planes × 4 bands of deterministic
    hash hyperplanes — 2^16 buckets/band bounds bucket width at corpus
    scale; see mlops/simsearch.py). Portable md5 plane weights → the
    oracle recomputes identical buckets in DuckDB."""
    from auth2wd_spark.mlops.simsearch import srp_lsh_buckets

    e = _t(spark, sf_dir, "embeddings", spread=True)
    return srp_lsh_buckets(e, n_planes=16, n_bands=4, hash_fn="md5")


def q_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: per-doc top-bigram share (integer
    math; explode + two map-side-combinable hash aggs, see
    mlops/textqc.ngram_repetition)."""
    from auth2wd_spark.mlops.textqc import ngram_repetition

    d = _t(spark, sf_dir, "documents", spread=True)
    return ngram_repetition(d, n=2)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction counts. The synthetic corpus text is
    PII-free, so the query plants deterministic emails / IPv4s / phones
    from doc_id BEFORE scrubbing (the oracle replays the identical
    augmentation) — the scrubber itself is generic
    (mlops/textqc.pii_scrub), one shuffle-free projection."""
    from auth2wd_spark.mlops.textqc import pii_scrub

    d = _t(spark, sf_dir, "documents", spread=True)
    doc_s = F.col("doc_id").cast("string")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" contact user"), doc_s, F.lit("@example.com now")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1 logged"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" call +1555000"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scrub(aug)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup dedup: MinHash-LSH candidate pairs → exact-Jaccard
    verification of the candidates (≥80%, integer math — LSH false
    positives would otherwise weld clusters at the closure step) →
    connected components (the engine's CC operator, operators/cc.py) →
    one canonical doc per transitive near-dup cluster. Portable md5
    hashes → DuckDB replays candidates, verification AND the closure
    (recursive CTE)."""
    from auth2wd_spark.mlops.dedup import dedup_clusters

    d = _t(spark, sf_dir, "documents", spread=True)
    return dedup_clusters(
        d, n_hashes=16, n_bands=4, hash_fn="md5", verify_threshold_pct=80
    )


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus inverted term statistics (doc_freq / collection_freq /
    max_tf per term) — exact integer math, two map-side-combinable
    hash aggs (mlops/textqc.term_stats)."""
    from auth2wd_spark.mlops.textqc import term_stats

    d = _t(spark, sf_dir, "documents", spread=True)
    return term_stats(d)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings with
    the engine's deterministic trained k-means, then drop vectors with a
    near-identical (cos ≥ 0.99 after rounding) lower-id neighbor INSIDE
    their cluster — pairwise cost is per-cluster, never all-pairs.
    Planted scaled copies (cosine≈1.0) of the first 25 vectors are the
    non-vacuous dup population, same augmentation as
    dedup_embedding_cosine; DuckDB replays training, assignment and the
    in-cluster pair scan bit-identically (mlops/dedup.semantic_dedup)."""
    from auth2wd_spark.mlops.dedup import semantic_dedup

    e = _t(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = e.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.5).alias("embedding"),
    )
    return semantic_dedup(
        e.union(planted), n_centroids=16, n_iter=2, threshold=0.99
    )


def q_tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed TF-IDF document vectors (hashing trick): sparse
    (doc_id, bucket, w_micro) rows with exact-integer micro-quantized
    weights — one ln per distinct doc-frequency, everything downstream
    BIGINT (mlops/textqc.tfidf_vectors)."""
    from auth2wd_spark.mlops.textqc import tfidf_vectors

    d = _t(spark, sf_dir, "documents", spread=True)
    return tfidf_vectors(d, dim=64)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix sampling: per-language Bernoulli rates
    as a pure function of (doc_id, salt) — portable md5 draw, no RNG
    state, shuffle-free (mlops/sampling.stratified_sample). English
    down-sampled to 30%, zh/es kept at 80%, unlisted languages default
    50% — the standard crawl-rebalance shape."""
    from auth2wd_spark.mlops.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        d,
        {"en": 300000, "zh": 800000, "es": 800000},
        strata_col="lang",
        salt="s0",
        default_ppm=500000,
    )
    return out.select("doc_id", "lang")


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram log-probability under the corpus's own unigram
    model — the CCNet-style perplexity-proxy quality signal; one ln per
    distinct term micro-quantized, all sums exact BIGINT
    (mlops/textqc.unigram_logprob)."""
    from auth2wd_spark.mlops.textqc import unigram_logprob

    d = _t(spark, sf_dir, "documents", spread=True)
    return unigram_logprob(d)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (12-token windows, 4-token overlap →
    stride 8): per-row array expressions only, zero shuffle
    (mlops/chunking.chunk_documents)."""
    from auth2wd_spark.mlops.chunking import chunk_documents

    d = _t(spark, sf_dir, "documents", spread=True)
    return chunk_documents(d, chunk_tokens=12, overlap=4)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing into 32-token training sequences
    over 8 md5-bucketed packing streams — running-total window per
    bucket, every sort partition bounded (mlops/chunking.pack_sequences)."""
    from auth2wd_spark.mlops.chunking import pack_sequences

    d = _t(spark, sf_dir, "documents", spread=True)
    return pack_sequences(d, capacity_tokens=32, n_buckets=8)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by exact 3-gram overlap (GPT-3 App. C
    recipe): every doc_id % 20 == 0 document stands in for the eval set,
    the rest are the corpus; a corpus doc is flagged when it shares any
    k-gram hash with the benchmark (mlops/dedup.decontaminate)."""
    from auth2wd_spark.mlops.dedup import decontaminate

    d = _t(spark, sf_dir, "documents", spread=True)
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    return decontaminate(corpus, bench, k=3)


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level crawl dedup: canonicalize (case, www., default ports,
    tracking params, param order, trailing slash, fragments) then keep
    the lowest doc_id per canonical URL. The corpus has no URL column,
    so the query plants deterministic messy URLs from doc_id — the
    oracle replays the identical synthesis, then canonicalizes with the
    same RE2-safe regexes (mlops/urls.py). One hash aggregation; the
    canonical form itself is a shuffle-free projection."""
    from auth2wd_spark.mlops.urls import url_dedup

    d = _t(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    scheme = F.when(doc % 2 == 0, F.lit("HTTP")).otherwise(F.lit("http"))
    site = (doc % 5).cast("string")
    hostport = (
        F.when(doc % 3 == 0, F.concat(F.lit("WWW.Site"), site, F.lit(".COM")))
        .when(doc % 3 == 1, F.concat(F.lit("site"), site, F.lit(".com:80")))
        .otherwise(F.concat(F.lit("Site"), site, F.lit(".com")))
    )
    path = F.concat(
        F.lit("/a/"),
        F.expr("doc_id DIV 7").cast("string"),
        F.when(doc % 4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = (
        F.when(doc % 4 == 0, F.lit("?b=2&a=1"))
        .when(doc % 4 == 1, F.lit("?a=1&utm_source=x&b=2"))
        .when(doc % 4 == 2, F.concat(F.lit("?a=1&b=2&fbclid="), doc.cast("string")))
        .otherwise(F.lit("?b=2&a=1&utm_campaign=yy"))
    )
    frag = F.when(
        doc % 5 == 0, F.concat(F.lit("#sec"), (doc % 7).cast("string"))
    ).otherwise(F.lit(""))
    urls = d.select(
        "doc_id", F.concat(scheme, F.lit("://"), hostport, path, query, frag).alias("url")
    )
    return url_dedup(urls)


def q_pq_adc_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: train per-subspace L2 codebooks (m=4 ×
    k=8, 2 Lloyd iterations, all subspaces in one keyed job), encode the
    corpus to 4 codes/vector, then ADC top-5 for query vec_id=0 — search
    touches only codes + a broadcast (m×k) partial-distance table, never
    raw vectors (mlops/pq.py). DuckDB replays training, encoding, and
    search bit-identically (quantized-BIGINT means; every distance
    ROUNDed before its argmin/ORDER BY)."""
    from auth2wd_spark.mlops.pq import pq_adc_topk, pq_encode, train_pq_codebooks

    e = _t(spark, sf_dir, "embeddings", spread=True)
    cb = train_pq_codebooks(e, m=4, k=8, dim=64, n_iter=2)
    codes = pq_encode(e, cb, m=4, dim=64)
    q = e.filter(F.col("vec_id") == 0)
    return pq_adc_topk(q, cb, codes, m=4, dim=64, k_neighbors=5)


def q_ivfpq_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (the FAISS-style composition): coarse L2 k-means
    (n_lists=8, trained as single-subspace PQ — one Lloyd's code path)
    assigns inverted lists; PQ codebooks (m=4 × k=8) are trained on
    RESIDUALS; the query probes its 2 nearest lists and ADC-scores only
    their members (mlops/pq.train_ivfpq / ivfpq_adc_topk). DuckDB
    replays coarse training, residuals, product training, encoding, the
    probe, and the scored top-5 bit-identically."""
    from auth2wd_spark.mlops.pq import ivfpq_adc_topk, train_ivfpq

    e = _t(spark, sf_dir, "embeddings", spread=True)
    coarse, _lists, codebooks, codes = train_ivfpq(
        e, n_lists=8, m=4, k=8, dim=64, n_iter=2
    )
    q = e.filter(F.col("vec_id") == 0)
    return ivfpq_adc_topk(q, coarse, codebooks, codes, m=4, dim=64, n_probe=2, k_neighbors=5)


def q_ivfpq_rerank_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVF-PQ recipe: ADC shortlist (top-50, probe 2/8)
    + EXACT L2 re-rank against raw vectors for the shortlist only
    (mlops/pq.ivfpq_rerank_topk). Measured here: re-rank lifts recall@1
    from ~0.2 (raw ADC) to 0.60-0.80 on this deliberately weak-margin
    corpus, while raw-vector IO stays proportional to the shortlist.
    DuckDB replays the whole chain including the exact stage."""
    from auth2wd_spark.mlops.pq import ivfpq_rerank_topk, train_ivfpq

    e = _t(spark, sf_dir, "embeddings", spread=True)
    coarse, _lists, codebooks, codes = train_ivfpq(
        e, n_lists=8, m=4, k=8, dim=64, n_iter=2
    )
    q = e.filter(F.col("vec_id") == 0)
    return ivfpq_rerank_topk(
        q, e, coarse, codebooks, codes, m=4, dim=64, n_probe=2, shortlist=50, k_neighbors=5
    )


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection: k=3-token shingles, min of
    each w=4 window, distinct — all inside per-row array expressions
    (zero shuffle; mlops/textqc.winnowing_fingerprints). Portable md5
    hashes → DuckDB replays the identical selection."""
    from auth2wd_spark.mlops.textqc import winnowing_fingerprints

    d = _t(spark, sf_dir, "documents", spread=True)
    return winnowing_fingerprints(d, k=3, w=4)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed uni+bigram
    features (dim=1024 md5 buckets), add-one-smoothed log-ratio of the
    target exemplar distribution (doc_id % 10 == 0 stands in for the
    curated set) over the raw pool, per-doc score = exact BIGINT sum of
    tf·lr_micro — only 2·dim `ln`s in the whole job, log-ratio table
    broadcast (mlops/sampling.dsir_weights)."""
    from auth2wd_spark.mlops.sampling import dsir_weights

    d = _t(spark, sf_dir, "documents", spread=True)
    target = d.filter(F.col("doc_id") % 10 == 0)
    raw = d.filter(F.col("doc_id") % 10 != 0)
    return dsir_weights(raw, target, dim=1024)


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005):
    4×256 sketch built as ONE bounded-state hash agg over the token
    stream, broadcast to probe every distinct term, keep terms whose
    min-estimate is ≥ 5000 ppm of the corpus (pure-BIGINT relative
    test); exact_cnt column exposes the one-sided error
    (mlops/sketch.cms_heavy_hitters)."""
    from auth2wd_spark.mlops.sketch import cms_heavy_hitters

    d = _t(spark, sf_dir, "documents", spread=True)
    return cms_heavy_hitters(d, depth=4, width=256, threshold_ppm=5000)


def q_bloom_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot Bloom membership dedup: even doc_ids are last
    month's SEEN snapshot, odd ids plus planted re-crawls (copies of
    seen ids < 100, shifted by +1e6) are INCOMING; the filter is the
    distinct set-bit table (m=65536, k=3, md5 positions) broadcast into
    a semi-join — re-crawls are flagged with certainty, fresh docs only
    on a k-way collision (mlops/dedup.bloom_cross_dedup)."""
    from auth2wd_spark.mlops.dedup import bloom_cross_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    seen = d.filter(F.col("doc_id") % 2 == 0)
    planted = seen.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    incoming = d.filter(F.col("doc_id") % 2 != 0).unionAll(planted)
    return bloom_cross_dedup(seen, incoming, m_bits=65536, k=3)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich 2016): 4 merge iterations over
    the vocabulary-sized word-count table — one corpus scan, then each
    iteration is a pair agg + one-row broadcast argmax + one literal
    replace; zero collect (mlops/bpe.train_bpe)."""
    from auth2wd_spark.mlops.bpe import train_bpe

    d = _t(spark, sf_dir, "documents", spread=True)
    return train_bpe(d, n_merges=4)


def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encode table the trained merges produce: every distinct word
    with its final segmentation (space-joined for the hash compare) and
    piece count (mlops/bpe.bpe_segment)."""
    from auth2wd_spark.mlops.bpe import bpe_segment

    d = _t(spark, sf_dir, "documents", spread=True)
    out = bpe_segment(d, n_merges=4)
    return out.select(
        "word",
        "cnt",
        F.array_join("pieces", " ").alias("segmentation"),
        "n_pieces",
    )


_BM25_TERMS = ["join", "spark", "window"]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (Lucene-variant idf): top-10 docs for a
    3-term probe query — one membership-filtered corpus scan, a
    broadcast idf table, exact-BIGINT micro-quantized scores
    (mlops/retrieval.bm25_topk)."""
    from auth2wd_spark.mlops.retrieval import bm25_topk

    d = _t(spark, sf_dir, "documents")
    return bm25_topk(d, _BM25_TERMS, topk=10)


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode-side composition: per-document BPE token count under the
    4-merge vocabulary — the corpus joins the BROADCAST vocabulary-sized
    segment table on word (no corpus shuffle) and sums n_pieces."""
    from auth2wd_spark.mlops.bpe import bpe_segment

    d = _t(spark, sf_dir, "documents", spread=True)
    seg = bpe_segment(d, n_merges=4).select("word", "n_pieces")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        toks.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("bpe_tokens"),
        )
    )


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022) re-expressed for Spark:
    maximal ≥k-token spans appearing in ≥2 docs, found by k-gram
    doc-frequency + a per-doc gaps-and-islands HOF fold — no suffix
    array, no window function, no driver (mlops/dedup.duplicate_spans)."""
    from auth2wd_spark.mlops.dedup import duplicate_spans

    d = _t(spark, sf_dir, "documents", spread=True)
    return duplicate_spans(d, k=8, min_docs=2)


def q_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal pass: every document's text rebuilt with its
    cross-document duplicated spans dropped — one id-keyed left join +
    a per-row HOF token filter (mlops/dedup.strip_duplicate_spans)."""
    from auth2wd_spark.mlops.dedup import strip_duplicate_spans

    d = _t(spark, sf_dir, "documents", spread=True)
    return strip_duplicate_spans(d, k=8, min_docs=2)


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog vocabulary-size estimate (p=10, ~3.3% stderr) with
    the exact distinct count alongside — registers are a 2^p-bounded
    max-agg, the harmonic sum is an exact BIGINT over the authoring-time
    quantized 2^-r table (mlops/sketch.hll_distinct)."""
    from auth2wd_spark.mlops.sketch import hll_distinct

    d = _t(spark, sf_dir, "documents", spread=True)
    return hll_distinct(d, p=10)


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram log-probability under the corpus's own
    add-one-smoothed bigram model — penalizes scrambled word ORDER, not
    just rare words; one ln per distinct bigram type, per-doc scores
    exact BIGINT sums (mlops/textqc.bigram_logprob)."""
    from auth2wd_spark.mlops.textqc import bigram_logprob

    d = _t(spark, sf_dir, "documents", spread=True)
    return bigram_logprob(d)


def q_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix accounting: per-language doc/token totals and each
    stratum's exact-integer corpus share (BIGINT DIV, never a double) —
    one two-column scan + one stratum agg (mlops/textqc.mix_report)."""
    from auth2wd_spark.mlops.textqc import mix_report

    d = _t(spark, sf_dir, "documents")
    return mix_report(d, strata_col="lang")


def q_asof_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/temporal.asof_join): every error
    event gets the same user's most recent click at-or-before it.
    UNION + per-key WINDOW — one Exchange, no join node, no per-key
    quadratic blowup (the scalable form of "which id→QID mapping was
    valid at crawl time"). Clicks pre-deduped to one per (user, ts) so
    both engines face a tie-free match."""
    from auth2wd_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(errors, clicks, on="user_id", left_ts="ts", right_ts="ts")
    # unmatched lefts → -1 sentinels: keeps both engines' result frames
    # non-null BIGINT (nullable ints degrade to float64 in pandas, which
    # the driver's dtype compare would flag)
    return out.select(
        "event_id",
        F.coalesce(F.col("click_id_right"), F.lit(-1)).cast("long").alias("click_id"),
        F.coalesce(
            # timestampdiff works on TIMESTAMP_NTZ (unix_micros does not)
            # and is tz-independent, matching DuckDB's epoch_us difference
            F.expr("timestampdiff(MICROSECOND, ts_right, ts)"),
            F.lit(-1),
        )
        .cast("long")
        .alias("gap_micros"),
    )


def q_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/temporal.range_join): every event falling
    inside a same-user [purchase, purchase+6h) attribution window.
    Intervals explode onto fixed 6h time buckets, points land in exactly
    one bucket, so the (user, bucket) equi-join emits each true pair
    exactly once — never a Cartesian with a BETWEEN filter."""
    from auth2wd_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events", spread=True)
    wins = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("end_ts"),
    )
    pts = ev.select("event_id", "user_id", "ts")
    out = range_join(
        pts,
        wins,
        point_ts="ts",
        start_col="start_ts",
        end_col="end_ts",
        on="user_id",
        bucket_width_s=6 * 3600,
    )
    return out.select("event_id", "win_id")


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank (operators/graph.pagerank) over the directed
    part-succession graph — part at line i → part at line i+1 within
    each order. Cross-order reuse of parts makes this graph genuinely
    cyclic (unlike any bipartite projection, where rank converges after
    one step), so the 3 power iterations propagate mass for real. The
    all-BIGINT update rule lets DuckDB replay the recurrence
    bit-identically via unrolled CTEs (same determinism discipline as
    the k-means oracle)."""
    from auth2wd_spark.operators.graph import pagerank

    edges = _part_succession_edges(spark, sf_dir)
    return pagerank(edges, n_iter=3).select("node", F.col("rank").alias("rank_ppt"))


def q_ppr_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph.pagerank, seeds=...) —
    teleport restarts at the parts of the first ten orders, so rank is
    graph proximity to that seed basket: the candidate-ordering signal
    an entity linker wants ("closest to the entities already resolved
    on this page"). Same bit-identical BIGINT recurrence, seed-flagged."""
    from auth2wd_spark.operators.graph import pagerank

    edges = _part_succession_edges(spark, sf_dir)
    seeds = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 10)
        .select(F.col("l_partkey").cast("string").alias("node"))
        .distinct()
    )
    return pagerank(edges, n_iter=3, seeds=seeds).select(
        "node", F.col("rank").alias("rank_ppt")
    )


def _part_succession_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
    ).select(
        F.col("a.l_partkey").cast("string").alias("src"),
        F.col("b.l_partkey").cast("string").alias("dst"),
    )


def q_khop_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop BFS expansion (operators/graph.k_hop) from the first ten
    orders' parts over the part-succession graph — the depth-bounded
    cluster-expansion shape of the reference's J8 combinator fixpoint,
    as a per-hop frontier join + anti-join."""
    from auth2wd_spark.operators.graph import k_hop

    seeds = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 10)
        .select(F.col("l_partkey").cast("string").alias("node"))
        .distinct()
    )
    return k_hop(_part_succession_edges(spark, sf_dir), seeds, k=3)


def q_jaccard_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard merge candidates
    (operators/graph.neighborhood_jaccard) over the part co-purchase
    graph: pairs sharing ≥2 neighbors with Jaccard ≥ 0.1, common
    neighbors capped at degree ≤ 40 (the graph-stopword cap, replayed
    by the oracle). Exact-BIGINT micro score."""
    from auth2wd_spark.operators.graph import neighborhood_jaccard

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("string").alias("src"),
            F.col("b.l_partkey").cast("string").alias("dst"),
        )
    )
    return neighborhood_jaccard(
        edges, min_common=2, min_jaccard_micro=100_000, max_neighbor_degree=40
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (operators/graph.triangle_count) over the
    part co-purchase graph (parts sharing an order, l_orderkey ≤ 2000).
    Spark runs the degree-oriented wedge algorithm (hub-safe); the
    oracle enumerates the same triangle set via the id-ordered 3-way
    self-join — the sets coincide because orientation only changes WHO
    generates each wedge, never which 3-cliques exist."""
    from auth2wd_spark.operators.graph import triangle_count

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("string").alias("src"),
            F.col("b.l_partkey").cast("string").alias("dst"),
        )
    )
    return triangle_count(edges)


# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "route_url2extid": q_route_url2extid,
        "dedup_claims": q_dedup_claims,
        "single_hit_guard": q_single_hit_guard,
        "precision_demotion": q_precision_demotion,
        "first_per_lang": q_first_per_lang,
        "broadcast_link": q_broadcast_link,
        "rescue_join": q_rescue_join,
        "merge_diff": q_merge_diff,
        "date_precision_parse": q_date_precision_parse,
        "label_transform": q_label_transform,
        "cc_components": q_cc_components,
        "sessionize": q_sessionize,
        "pricing_summary": q_pricing_summary,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "ann_cosine_top1": q_ann_cosine_top1,
        "ann_ivf_top1": q_ann_ivf_top1,
        "ann_lsh": q_ann_lsh,
        "salted_agg": q_salted_agg,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "multimodal_features": q_multimodal_features,
        "frame_sample_plan": q_frame_sample_plan,
        "resize_images": q_resize_images,
        "ngram_repetition": q_ngram_repetition,
        "pii_scrub": q_pii_scrub,
        "winnowing": q_winnowing,
        "dedup_clusters": q_dedup_clusters,
        "term_stats": q_term_stats,
        "semantic_dedup": q_semantic_dedup,
        "tfidf_vectors": q_tfidf_vectors,
        "stratified_sample": q_stratified_sample,
        "unigram_logprob": q_unigram_logprob,
        "url_dedup": q_url_dedup,
        "pq_adc_top5": q_pq_adc_top5,
        "ivfpq_top5": q_ivfpq_top5,
        "ivfpq_rerank_top5": q_ivfpq_rerank_top5,
        "chunk_documents": q_chunk_documents,
        "pack_sequences": q_pack_sequences,
        "decontaminate": q_decontaminate,
        "dsir_weights": q_dsir_weights,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "bloom_cross_dedup": q_bloom_cross_dedup,
        "hll_distinct": q_hll_distinct,
        "bpe_merges": q_bpe_merges,
        "bpe_segment": q_bpe_segment,
        "bpe_token_count": q_bpe_token_count,
        "bm25_topk": q_bm25_topk,
        "duplicate_spans": q_duplicate_spans,
        "strip_spans": q_strip_spans,
        "bigram_logprob": q_bigram_logprob,
        "mix_report": q_mix_report,
        "asof_clicks": q_asof_clicks,
        "range_join_windows": q_range_join_windows,
        "pagerank": q_pagerank,
        "ppr_proximity": q_ppr_proximity,
        "khop_parts": q_khop_parts,
        "jaccard_candidates": q_jaccard_candidates,
        "triangle_count": q_triangle_count,
    }


def _kmeans_ctes(
    e_body: str, n_iter: int = 2, n_centroids: int = 16, quant: int = 1_000_000
) -> list:
    """Shared DuckDB CTE chain replaying train_centroids_kmeans +
    nearest-centroid assignment (e → cent0..cent{n_iter} → assign) —
    used by both the IVF-ANN oracle and the SemDeDup oracle. `e_body`
    is the SQL for the vector table (vec_id, embedding DOUBLE[]).

    The centroid mean uses the same exact-BIGINT quantized sum as the
    Spark side (integer sums are order-independent, so partial-agg vs
    serial-scan cannot diverge), and every cosine is ROUNDed to
    IVF_COS_DECIMALS before its ORDER BY — mirroring mlops/simsearch.py
    exactly, so the two engines' different fp cosine expressions cannot
    flip a near-tie argmax (ADVICE r4)."""
    from auth2wd_spark.mlops.simsearch import IVF_COS_DECIMALS as _D

    ctes = [
        f"e AS ({e_body})",
        f"cent0 AS (SELECT vec_id AS centroid_id, embedding FROM e ORDER BY vec_id LIMIT {n_centroids})",
    ]
    for i in range(1, n_iter + 1):
        prev = f"cent{i - 1}"
        ctes += [
            f"""a{i} AS (
              SELECT ev.vec_id, c.centroid_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY ev.vec_id
                       ORDER BY ROUND(list_cosine_similarity(ev.embedding, c.embedding), {_D}) DESC,
                                c.centroid_id) AS rn
              FROM e ev CROSS JOIN {prev} c)""",
            f"""m{i} AS (
              SELECT a.centroid_id, t.pos,
                     CAST(SUM(CAST(ROUND(ev.embedding[t.pos] * {quant}) AS BIGINT)) AS DOUBLE)
                       / (COUNT(*) * {quant}.0) AS m
              FROM a{i} a JOIN e ev ON ev.vec_id = a.vec_id,
                   UNNEST(range(1, len(ev.embedding)+1)) AS t(pos)
              WHERE a.rn = 1
              GROUP BY a.centroid_id, t.pos)""",
            f"""cm{i} AS (
              SELECT centroid_id, list(m ORDER BY pos) AS embedding
              FROM m{i} GROUP BY centroid_id)""",
            f"""cent{i} AS (
              SELECT c0.centroid_id, COALESCE(cm.embedding, c0.embedding) AS embedding
              FROM {prev} c0 LEFT JOIN cm{i} cm USING (centroid_id))""",
        ]
    ctes.append(
        f"""assign AS (
              SELECT ev.vec_id, c.centroid_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY ev.vec_id
                       ORDER BY ROUND(list_cosine_similarity(ev.embedding, c.embedding), {_D}) DESC,
                                c.centroid_id) AS rn
              FROM e ev CROSS JOIN cent{n_iter} c)"""
    )
    return ctes


_E_RAW = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings"


def _ivf_kmeans_oracle(n_iter: int = 2, n_centroids: int = 16, quant: int = 1_000_000) -> str:
    """DuckDB replay of train_centroids_kmeans + the IVF search (shared
    training/assignment CTEs in _kmeans_ctes; this tail adds the probe,
    candidate and ranked stages of ivf_ann_topk)."""
    from auth2wd_spark.mlops.simsearch import IVF_COS_DECIMALS as _D

    ctes = _kmeans_ctes(_E_RAW, n_iter=n_iter, n_centroids=n_centroids, quant=quant)
    ctes += [
        "lists AS (SELECT vec_id AS neighbor_id, centroid_id FROM assign WHERE rn = 1)",
        """probes AS (
              SELECT vec_id AS query_id, centroid_id
              FROM assign WHERE rn <= 2 AND vec_id < 10)""",
        """cand AS (
              SELECT DISTINCT p.query_id, l.neighbor_id
              FROM probes p JOIN lists l USING (centroid_id)
              WHERE p.query_id != l.neighbor_id)""",
        f"""ranked AS (
              SELECT c.query_id, c.neighbor_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY c.query_id
                       ORDER BY ROUND(list_cosine_similarity(q.embedding, n.embedding), {_D}) DESC,
                                c.neighbor_id) AS rn
              FROM cand c
              JOIN e q ON q.vec_id = c.query_id
              JOIN e n ON n.vec_id = c.neighbor_id)""",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT query_id, neighbor_id FROM ranked WHERE rn = 1"
    )


def _semantic_dedup_oracle(
    n_iter: int = 2, n_centroids: int = 16, quant: int = 1_000_000, threshold: float = 0.99
) -> str:
    """DuckDB replay of semantic_dedup over the planted-copy augmentation:
    the SAME training/assignment CTE chain as the IVF oracle (over the
    augmented table), then the in-cluster lower-id-neighbor pair scan."""
    from auth2wd_spark.mlops.simsearch import IVF_COS_DECIMALS as _D

    e_body = f"""{_E_RAW}
          UNION ALL
          SELECT vec_id + 1000000,
                 list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.5)
          FROM embeddings WHERE vec_id < 25"""
    ctes = _kmeans_ctes(e_body, n_iter=n_iter, n_centroids=n_centroids, quant=quant)
    ctes += [
        "lists AS (SELECT vec_id, centroid_id FROM assign WHERE rn = 1)",
        f"""dup AS (
              SELECT DISTINCT b.vec_id
              FROM lists a
              JOIN lists b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
              JOIN e ea ON ea.vec_id = a.vec_id
              JOIN e eb ON eb.vec_id = b.vec_id
              WHERE ROUND(list_cosine_similarity(ea.embedding, eb.embedding), {_D})
                    >= {threshold})""",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
        SELECT l.vec_id, l.centroid_id,
               CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM lists l LEFT JOIN dup d ON d.vec_id = l.vec_id"""
    )


def _simhash_oracle(n_bits: int = 60) -> str:
    """DuckDB replay of the portable-md5 SimHash (see mlops/dedup.py)."""
    sums = ",\n                   ".join(
        f"SUM(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(n_bits)
    )
    fp = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(n_bits))
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
          FROM documents),
        h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks),
        b AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
        SELECT doc_id, CAST({fp} AS BIGINT) AS simhash64 FROM b
    """


def _minhash_ctes(n_hashes: int = 16, n_bands: int = 4) -> str:
    """Shared CTE body (toks → sig → bands) replaying the md5 min-hash
    signatures and band buckets — used by both the minhash_lsh oracle and
    the dedup_clusters oracle."""
    rpb = n_hashes // n_bands
    # two 60-bit hashes per md5 digest (hex 1-15 / 16-30) — mirrors
    # minhash_signatures' halved-digest scheme exactly
    mins = ",\n                 ".join(
        f"MIN(('0x' || substr(md5(tok || chr(31) || '{i // 2}'), "
        f"{1 if i % 2 == 0 else 16}, 15))::BIGINT) AS h{i}"
        for i in range(n_hashes)
    )
    band_rows = "\n          UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {bucket} AS bucket FROM sig".format(
            b=b,
            bucket=" || ',' || ".join(
                f"CAST(h{b * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for b in range(n_bands)
    )
    return f"""toks AS (
          SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
          FROM documents),
        sig AS (
          SELECT doc_id,
                 {mins}
          FROM toks GROUP BY doc_id),
        bands AS ({band_rows})"""


def _minhash_oracle(n_hashes: int = 16, n_bands: int = 4) -> str:
    """DuckDB replay of md5 min-hash signatures + band buckets."""
    return f"""
        WITH {_minhash_ctes(n_hashes, n_bands)}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands_hit
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    """


def _dedup_clusters_oracle(
    n_hashes: int = 16, n_bands: int = 4, threshold_pct: int = 80
) -> str:
    """DuckDB replay of dedup_clusters: the minhash candidate pairs,
    exact-Jaccard verified (reusing the distinct-token CTE the signatures
    are built from), fed through a recursive-CTE transitive closure;
    canonical = min reachable doc_id (the same min-member contract as the
    engine's CC operator)."""
    return f"""
        WITH RECURSIVE {_minhash_ctes(n_hashes, n_bands)},
        pairs AS (
          SELECT a.doc_id AS pa, b.doc_id AS pb
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY 1),
        inter AS (
          SELECT p.pa, p.pb, COUNT(*) AS n_shared
          FROM pairs p
          JOIN toks a ON a.doc_id = p.pa
          JOIN toks b ON b.doc_id = p.pb AND b.tok = a.tok
          GROUP BY 1, 2),
        vpairs AS (
          SELECT i.pa, i.pb
          FROM inter i
          JOIN sizes s1 ON s1.doc_id = i.pa
          JOIN sizes s2 ON s2.doc_id = i.pb
          WHERE i.n_shared * 100 >= {threshold_pct} * (s1.sz + s2.sz - i.n_shared)),
        sym AS (SELECT pa AS s, pb AS d FROM vpairs
                UNION SELECT pb, pa FROM vpairs),
        reach(a, b) AS (
          SELECT s, d FROM sym
          UNION
          SELECT r.a, s2.d FROM reach r JOIN sym s2 ON r.b = s2.s),
        comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon
                 FROM reach GROUP BY a)
        SELECT d.doc_id,
               CAST(COALESCE(c.canon, d.doc_id) AS BIGINT) AS canonical_doc_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """


def _ann_lsh_oracle(n_planes: int = 16, n_bands: int = 4) -> str:
    """DuckDB replay of the md5-weight SRP projections and band buckets."""
    total = n_planes * n_bands
    return f"""
        WITH weights AS (
          SELECT i.range AS i, p.range AS p,
                 ((('0x' || substr(md5(CAST(i.range AS VARCHAR) || chr(31) ||
                     CAST(p.range AS VARCHAR)), 1, 15))::BIGINT % 1000000)
                  / 500000.0 - 1.0) AS w
          FROM range(64) i, range({total}) p),
        dims AS (
          SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) - 1 AS i
          FROM embeddings),
        proj AS (
          SELECT d.vec_id, w.p, SUM(CAST(d.x AS DOUBLE) * w.w) AS pr
          FROM dims d JOIN weights w ON d.i = w.i
          GROUP BY 1, 2),
        bits AS (
          SELECT vec_id, CAST(p // {n_planes} AS INT) AS band,
                 CASE WHEN pr > 0 THEN (1::BIGINT << (p % {n_planes})) ELSE 0 END AS term
          FROM proj)
        SELECT vec_id, band, CAST(SUM(term) AS BIGINT) AS bucket
        FROM bits GROUP BY 1, 2
    """


def _pq_l2(w: int, D: int):
    """Rounded per-subspace L2² SQL snippet builder (w dims, D decimals)."""

    def l2(a: str, b: str) -> str:
        return (
            f"ROUND(list_sum(list_transform(range(1, {w + 1}), "
            f"i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i]))), {D})"
        )

    return l2


def _pq_training_ctes(
    p: str, src: str, m: int, k: int, dim: int, n_iter: int, quant: int, D: int
) -> tuple:
    """CTE chain replaying train_pq_codebooks + the final assignment over
    `src` (a (vec_id, emb DOUBLE[]) relation), every name prefixed with
    `p` so coarse (m=1) and product (m=4) trainings coexist in one query.
    Returns (ctes, last_centroid_cte, enc_cte, sub_cte)."""
    w = dim // m
    l2 = _pq_l2(w, D)
    ctes = [
        f"{p}ss AS (SELECT unnest(range(0, {m})) AS sub_id)",
        f"""{p}sub AS (
              SELECT e.vec_id, ss.sub_id,
                     e.emb[ss.sub_id*{w}+1 : ss.sub_id*{w}+{w}] AS sub_emb
              FROM {src} e CROSS JOIN {p}ss ss)""",
        f"{p}firstk AS (SELECT vec_id, emb FROM {src} ORDER BY vec_id LIMIT {k})",
        f"""{p}cent0 AS (
              SELECT ss.sub_id, f.vec_id AS centroid_id,
                     f.emb[ss.sub_id*{w}+1 : ss.sub_id*{w}+{w}] AS embedding
              FROM {p}firstk f CROSS JOIN {p}ss ss)""",
    ]
    for i in range(1, n_iter + 1):
        prev = f"{p}cent{i - 1}"
        ctes += [
            f"""{p}a{i} AS (
              SELECT s.vec_id, s.sub_id, c.centroid_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id, s.sub_id
                       ORDER BY {l2("s.sub_emb", "c.embedding")}, c.centroid_id) AS rn
              FROM {p}sub s JOIN {prev} c USING (sub_id))""",
            f"""{p}m{i} AS (
              SELECT a.sub_id, a.centroid_id, t.pos,
                     CAST(SUM(CAST(ROUND(s.sub_emb[t.pos] * {quant}) AS BIGINT)) AS DOUBLE)
                       / (COUNT(*) * {quant}.0) AS mval
              FROM {p}a{i} a JOIN {p}sub s ON s.vec_id = a.vec_id AND s.sub_id = a.sub_id,
                   UNNEST(range(1, {w + 1})) AS t(pos)
              WHERE a.rn = 1
              GROUP BY 1, 2, 3)""",
            f"""{p}cm{i} AS (
              SELECT sub_id, centroid_id, list(mval ORDER BY pos) AS embedding
              FROM {p}m{i} GROUP BY 1, 2)""",
            f"""{p}cent{i} AS (
              SELECT c0.sub_id, c0.centroid_id,
                     COALESCE(cm.embedding, c0.embedding) AS embedding
              FROM {prev} c0 LEFT JOIN {p}cm{i} cm USING (sub_id, centroid_id))""",
        ]
    last = f"{p}cent{n_iter}"
    ctes.append(
        f"""{p}enc AS (
              SELECT s.vec_id, s.sub_id, c.centroid_id AS code,
                     ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id, s.sub_id
                       ORDER BY {l2("s.sub_emb", "c.embedding")}, c.centroid_id) AS rn
              FROM {p}sub s JOIN {last} c USING (sub_id))"""
    )
    return ctes, last, f"{p}enc", f"{p}sub"


def _pq_oracle(
    m: int = 4, k: int = 8, dim: int = 64, n_iter: int = 2, quant: int = 1_000_000
) -> str:
    """DuckDB replay of train_pq_codebooks + pq_encode + pq_adc_topk
    (mlops/pq.py): per-subspace L2 Lloyd's with exact-BIGINT quantized
    means, every distance ROUNDed to PQ_DIST_DECIMALS before its
    argmin/ORDER BY — the same cross-engine determinism contract as the
    IVF oracle."""
    from auth2wd_spark.mlops.pq import PQ_DIST_DECIMALS as _D

    l2 = _pq_l2(dim // m, _D)
    ctes = ["e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)"]
    train, last, enc, sub = _pq_training_ctes("p", "e", m, k, dim, n_iter, quant, _D)
    ctes += train
    ctes += [
        f"qsub AS (SELECT sub_id, sub_emb FROM {sub} WHERE vec_id = 0)",
        f"""tbl AS (
              SELECT c.sub_id, c.centroid_id AS code,
                     {l2("q.sub_emb", "c.embedding")} AS pd2
              FROM {last} c JOIN qsub q USING (sub_id))""",
        f"""scored AS (
              SELECT en.vec_id AS neighbor_id, ROUND(SUM(t.pd2), {_D}) AS approx_d2
              FROM {enc} en JOIN tbl t ON en.sub_id = t.sub_id AND en.code = t.code
              WHERE en.rn = 1 AND en.vec_id <> 0
              GROUP BY en.vec_id)""",
        """ranked AS (
              SELECT CAST(0 AS BIGINT) AS query_id, neighbor_id, approx_d2,
                     ROW_NUMBER() OVER (ORDER BY approx_d2, neighbor_id) AS rank
              FROM scored)""",
    ]
    joined = ",\n".join(ctes)
    return f"""
        WITH {joined}
        SELECT query_id, neighbor_id, approx_d2, rank FROM ranked WHERE rank <= 5
    """


def _ivfpq_oracle(
    n_lists: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    n_iter: int = 2,
    quant: int = 1_000_000,
    rerank_shortlist: int = 0,
) -> str:
    """DuckDB replay of train_ivfpq + ivfpq_adc_topk (mlops/pq.py):
    coarse L2 k-means (the PQ trainer at m=1) assigns every vector a
    list; PQ codebooks are trained on RESIDUALS (x − coarse centroid,
    Jégou et al. 2011 §IV); the query probes its n_probe nearest lists,
    builds one residual partial-distance table per probed list, and
    ADC-scores only vectors whose list was probed. rerank_shortlist > 0
    appends the production re-rank stage (ivfpq_rerank_topk): exact L2
    against raw vectors for the ADC top-`rerank_shortlist` only."""
    from auth2wd_spark.mlops.pq import PQ_DIST_DECIMALS as _D

    l2full = _pq_l2(dim, _D)
    l2sub = _pq_l2(dim // m, _D)
    w = dim // m
    ctes = ["e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)"]
    # coarse quantizer: single-subspace PQ training == plain L2 k-means
    coarse, ccent, cenc, _csub = _pq_training_ctes(
        "c", "e", 1, n_lists, dim, n_iter, quant, _D
    )
    ctes += coarse
    ctes += [
        f"lists AS (SELECT vec_id, code AS list_id FROM {cenc} WHERE rn = 1)",
        f"""res AS (
              SELECT e.vec_id,
                     list_transform(range(1, {dim + 1}),
                                    i -> e.emb[i] - c.embedding[i]) AS emb
              FROM e JOIN lists l ON l.vec_id = e.vec_id
                     JOIN {ccent} c ON c.centroid_id = l.list_id AND c.sub_id = 0)""",
    ]
    # product codebooks on the residuals
    prod, pcent, penc, _psub = _pq_training_ctes("p", "res", m, k, dim, n_iter, quant, _D)
    ctes += prod
    ctes += [
        f"""qlists AS (
              SELECT c.centroid_id AS list_id, c.embedding AS c_emb,
                     ROW_NUMBER() OVER (
                       ORDER BY {l2full("q.emb", "c.embedding")}, c.centroid_id) AS rn
              FROM {ccent} c CROSS JOIN (SELECT emb FROM e WHERE vec_id = 0) q)""",
        f"""qres AS (
              SELECT ql.list_id,
                     list_transform(range(1, {dim + 1}),
                                    i -> q.emb[i] - ql.c_emb[i]) AS remb
              FROM qlists ql CROSS JOIN (SELECT emb FROM e WHERE vec_id = 0) q
              WHERE ql.rn <= {n_probe})""",
        f"""tbl AS (
              SELECT qr.list_id, cb.sub_id, cb.centroid_id AS code,
                     {l2sub(f"(qr.remb[cb.sub_id*{w}+1 : cb.sub_id*{w}+{w}])", "cb.embedding")}
                       AS pd2
              FROM qres qr CROSS JOIN {pcent} cb)""",
        f"""scored AS (
              SELECT en.vec_id AS neighbor_id, ROUND(SUM(t.pd2), {_D}) AS approx_d2
              FROM {penc} en
                   JOIN lists l ON l.vec_id = en.vec_id
                   JOIN tbl t ON t.list_id = l.list_id
                            AND t.sub_id = en.sub_id AND t.code = en.code
              WHERE en.rn = 1 AND en.vec_id <> 0
              GROUP BY en.vec_id)""",
        """ranked AS (
              SELECT CAST(0 AS BIGINT) AS query_id, neighbor_id, approx_d2,
                     ROW_NUMBER() OVER (ORDER BY approx_d2, neighbor_id) AS rank
              FROM scored)""",
    ]
    if rerank_shortlist:
        ctes += [
            f"""rr AS (
              SELECT r.query_id, r.neighbor_id,
                     {l2full("en.emb", "q.emb")} AS exact_d2
              FROM ranked r
                   JOIN e en ON en.vec_id = r.neighbor_id
                   CROSS JOIN (SELECT emb FROM e WHERE vec_id = 0) q
              WHERE r.rank <= {rerank_shortlist})""",
            """rranked AS (
              SELECT query_id, neighbor_id, exact_d2,
                     ROW_NUMBER() OVER (ORDER BY exact_d2, neighbor_id) AS rank
              FROM rr)""",
        ]
        joined = ",\n".join(ctes)
        return f"""
            WITH {joined}
            SELECT query_id, neighbor_id, exact_d2, rank FROM rranked WHERE rank <= 5
        """
    joined = ",\n".join(ctes)
    return f"""
        WITH {joined}
        SELECT query_id, neighbor_id, approx_d2, rank FROM ranked WHERE rank <= 5
    """


def _hll_oracle() -> str:
    """DuckDB replays the HLL bit-for-bit: same 60-bit md5 hash, same
    minimal-binary-string rho, same authoring-time quantized 2^-r table
    (imported — the two engines CANNOT drift), exact-BIGINT harmonic
    sum; the only runtime doubles are the final one-row divide/ln/round,
    the identical IEEE sequence the Spark side executes."""
    from auth2wd_spark.mlops.sketch import _HLL_Q, _HLL_SCALE, _hll_am_scaled

    p, tail = 10, 50
    m = 1 << p
    mask = (1 << tail) - 1
    am = _hll_am_scaled(p)
    qlist = "[" + ", ".join(str(q) for q in _HLL_Q) + "]"
    return f"""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
          FROM documents),
        h AS (
          SELECT ('0x' || substr(md5('hll' || chr(31) || term), 1, 15))::BIGINT AS h
          FROM toks),
        br AS (
          SELECT h >> {tail} AS bucket,
                 CASE WHEN (h & {mask}) = 0 THEN {tail + 1}
                      ELSE {tail} - length(bin(h & {mask})) + 1 END AS rho
          FROM h),
        regs AS (SELECT bucket, MAX(rho) AS register FROM br GROUP BY 1),
        byr AS (SELECT register, COUNT(*) AS cnt FROM regs GROUP BY 1),
        parts AS (
          SELECT COALESCE(CAST(SUM(cnt * list_extract({qlist}, register + 1)) AS BIGINT), 0) AS s_ne,
                 COALESCE(CAST(SUM(cnt) AS BIGINT), 0) AS nonempty
          FROM byr),
        ex AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS exact_distinct FROM toks),
        fin AS (
          SELECT nonempty, {m} - nonempty AS v,
                 GREATEST(s_ne + ({m} - nonempty) * {_HLL_SCALE}, 1) AS s_quant,
                 exact_distinct
          FROM parts CROSS JOIN ex)
        SELECT CAST(ROUND((CASE WHEN ({am!r} / s_quant) <= {2.5 * m!r} AND v > 0
                                THEN {float(m)!r} * ln({float(m)!r} / v)
                                ELSE {am!r} / s_quant END) * 1000) AS BIGINT)
                 AS hll_est_milli,
               nonempty,
               CAST(v AS BIGINT) AS zero_buckets,
               CAST(s_quant AS BIGINT) AS s_quant,
               exact_distinct
        FROM fin
    """


def _bpe_ctes(n_merges: int) -> str:
    """The BPE training loop UNROLLED into chained CTEs — DuckDB replays
    word counts, every pair aggregation, the deterministic argmax
    (ORDER BY pair_cnt DESC, l, r LIMIT 1 == Spark's min(struct(-cnt,
    l, r))) and the sentinel-delimited literal replace (both engines:
    left-to-right non-overlapping, and sentinel wrapping makes adjacent
    occurrences character-disjoint — see mlops/bpe.py)."""
    ctes = ["""w0 AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
               chr(31) || array_to_string(regexp_split_to_array(word, ''),
                                          chr(31) || chr(31))
                       || chr(31) || chr(31) || '</w>' || chr(31) AS seg
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY word)"""]
    for i in range(n_merges):
        ctes.append(f"""p{i} AS (
            SELECT pcs[j] AS l, pcs[j + 1] AS r,
                   CAST(SUM(cnt) AS BIGINT) AS pair_cnt
            FROM (SELECT cnt,
                         string_split(substr(seg, 2, length(seg) - 2),
                                      chr(31) || chr(31)) AS pcs
                  FROM w{i}),
                 UNNEST(range(1, GREATEST(len(pcs) - 1, 0) + 1)) AS t(j)
            GROUP BY 1, 2)""")
        ctes.append(
            f"t{i} AS (SELECT l, r, pair_cnt FROM p{i} "
            f"ORDER BY pair_cnt DESC, l, r LIMIT 1)"
        )
        ctes.append(f"""w{i + 1} AS (
            SELECT word, cnt,
                   replace(seg,
                           chr(31) || t.l || chr(31) || chr(31) || t.r || chr(31),
                           chr(31) || t.l || t.r || chr(31)) AS seg
            FROM w{i} CROSS JOIN t{i} t)""")
    return "WITH " + ",\n".join(ctes)


def _bm25_oracle(terms: list[str], topk: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    """Replays bm25_topk: same membership filter, same Lucene idf
    quantized to micro, the SAME IEEE expression tree for the length
    normalization (dl·N/T in one double division of exact BIGINTs),
    contributions rounded to BIGINT before the per-doc sum."""
    tl = "[" + ", ".join(f"'{t}'" for t in sorted(set(terms))) + "]"
    return f"""
        WITH per_doc AS (
          SELECT doc_id, len(ws) AS dl,
                 list_filter(ws, w -> list_contains({tl}, w)) AS hits
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
                FROM documents)),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(dl) AS BIGINT) AS total_tokens
                  FROM per_doc),
        tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM (SELECT doc_id, dl, unnest(hits) AS term
                     FROM per_doc WHERE len(hits) > 0)
               GROUP BY 1, 2, 3),
        dfr AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                FROM tf GROUP BY 1),
        idf AS (SELECT term,
                       CAST(ROUND(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                                  * 1000000.0) AS BIGINT) AS idf_micro,
                       n_docs, total_tokens
                FROM dfr CROSS JOIN stats),
        sc AS (SELECT t.doc_id,
                      CAST(ROUND(i.idf_micro * (t.tf * {k1 + 1.0!r})
                                 / (t.tf + {k1!r} * ({1.0 - b!r}
                                    + {b!r} * (t.dl * i.n_docs) / i.total_tokens)))
                        AS BIGINT) AS c
               FROM tf t JOIN idf i USING (term))
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS score_micro,
               CAST(COUNT(*) AS BIGINT) AS n_hit_terms
        FROM sc GROUP BY doc_id
        ORDER BY score_micro DESC, doc_id ASC LIMIT {int(topk)}
    """


def _pagerank_oracle(
    n_iter: int = 3,
    scale: int = 1_000_000_000_000,
    seed_where: str | None = None,
) -> str:
    """Unrolled integer-PageRank replay: r{k} CTEs repeat the exact
    BIGINT recurrence of operators/graph.pagerank (// is floor division
    in DuckDB, `div` is trunc in Spark — identical on the non-negative
    ranks here), so the final iteration's bits must match Spark's.
    With ``seed_where`` (a lineitem WHERE clause selecting seed parts)
    the teleport term concentrates on the seed set — the personalized
    variant."""
    if seed_where is None:
        flagged = "SELECT node, 1 AS is_base FROM nodes"
    else:
        flagged = f"""SELECT nodes.node,
                   CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_base
            FROM nodes LEFT JOIN (
              SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS node
              FROM lineitem WHERE {seed_where}) s ON nodes.node = s.node"""
    ctes = [
        f"""e AS (
            SELECT DISTINCT CAST(a.l_partkey AS VARCHAR) AS src,
                            CAST(b.l_partkey AS VARCHAR) AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND b.l_linenumber = a.l_linenumber + 1),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        flagged AS ({flagged}),
        nn AS (SELECT SUM(is_base) AS n_base FROM flagged),
        outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT node, is_base * ({scale} // nn.n_base) AS rank
               FROM flagged CROSS JOIN nn)"""
    ]
    for k in range(1, n_iter + 1):
        ctes.append(
            f"""i{k} AS (
            SELECT e.dst, SUM(r.rank // d.outdeg) AS inflow
            FROM e JOIN outdeg d ON e.src = d.src
                   JOIN r{k - 1} r ON r.node = e.src
            GROUP BY e.dst),
        r{k} AS (
            SELECT flagged.node,
                   flagged.is_base * (({scale} * 15) // (100 * nn.n_base))
                     + (85 * COALESCE(i{k}.inflow, 0)) // 100 AS rank
            FROM flagged CROSS JOIN nn
                 LEFT JOIN i{k} ON flagged.node = i{k}.dst)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank_ppt FROM r{n_iter}"
    )


def _khop_oracle(k: int = 3, seed_where: str = "l_orderkey <= 10") -> str:
    """Unrolled BFS replay: a{d} CTEs hold each hop's NEW nodes (frontier),
    v{d} the visited union — the exact loop of operators/graph.k_hop."""
    ctes = [
        f"""e AS (
            SELECT DISTINCT CAST(a.l_partkey AS VARCHAR) AS src,
                            CAST(b.l_partkey AS VARCHAR) AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND b.l_linenumber = a.l_linenumber + 1),
        v0 AS (
            SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS node,
                   CAST(0 AS BIGINT) AS depth
            FROM lineitem WHERE {seed_where})"""
    ]
    prev_frontier, prev_visited = "v0", "v0"
    for d in range(1, k + 1):
        ctes.append(
            f"""n{d} AS (
            SELECT DISTINCT e.dst AS node
            FROM e JOIN {prev_frontier} f ON e.src = f.node),
        a{d} AS (
            SELECT n{d}.node, CAST({d} AS BIGINT) AS depth
            FROM n{d} LEFT JOIN {prev_visited} v ON n{d}.node = v.node
            WHERE v.node IS NULL),
        v{d} AS (SELECT * FROM {prev_visited} UNION ALL SELECT * FROM a{d})"""
        )
        prev_frontier, prev_visited = f"a{d}", f"v{d}"
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, depth FROM {prev_visited}"


def _bpe_merges_oracle(n_merges: int = 4) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS it, l, r, l || r AS merged, pair_cnt FROM t{i}"
        for i in range(n_merges)
    )
    return _bpe_ctes(n_merges) + "\n" + unions


def _bpe_segment_oracle(n_merges: int = 4) -> str:
    return (
        _bpe_ctes(n_merges)
        + f"""
        SELECT word, cnt,
               array_to_string(string_split(substr(seg, 2, length(seg) - 2),
                                            chr(31) || chr(31)), ' ')
                 AS segmentation,
               CAST(len(string_split(substr(seg, 2, length(seg) - 2),
                                     chr(31) || chr(31))) AS BIGINT) AS n_pieces
        FROM w{n_merges}
    """
    )


_SPAN_MARKED_CTES = """
        w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM documents),
        g AS (SELECT doc_id, i - 1 AS pos,
                     md5(array_to_string(list_slice(ws, i, i + 7), ' ')) AS gh
              FROM w, UNNEST(range(1, GREATEST(len(ws) - 8 + 1, 0) + 1)) AS t(i)),
        dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
        m AS (SELECT doc_id, pos FROM g JOIN dup USING (gh))
"""


def oracle_sql() -> dict[str, str]:
    return {
        "hll_distinct": _hll_oracle(),
        "bpe_merges": _bpe_merges_oracle(4),
        "bpe_segment": _bpe_segment_oracle(4),
        "bpe_token_count": _bpe_ctes(4)
        + """
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(len(string_split(substr(s.seg, 2, length(s.seg) - 2),
                                         chr(31) || chr(31)))) AS BIGINT)
                 AS bpe_tokens
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
              FROM documents) t
        JOIN w4 s USING (word)
        WHERE t.word <> ''
        GROUP BY t.doc_id
        """,
        "bm25_topk": _bm25_oracle(_BM25_TERMS, topk=10),
        "duplicate_spans": f"""
            WITH {_SPAN_MARKED_CTES},
            lagged AS (
              SELECT doc_id, pos,
                     COALESCE(LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                              pos) AS prev
              FROM m),
            isl AS (
              SELECT doc_id, pos,
                     SUM(CASE WHEN pos - prev > 8 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS island
              FROM lagged)
            SELECT doc_id,
                   CAST(MIN(pos) AS BIGINT) AS span_start,
                   CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
                   CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_tokens
            FROM isl GROUP BY doc_id, island
        """,
        "strip_spans": f"""
            WITH {_SPAN_MARKED_CTES},
            cov AS (SELECT DISTINCT doc_id, pos + o AS cpos
                    FROM m, UNNEST(range(0, 8)) AS t(o)),
            toks AS (SELECT doc_id, i - 1 AS pos, ws[i] AS tok
                     FROM w, UNNEST(range(1, len(ws) + 1)) AS t(i))
            SELECT t.doc_id,
                   COALESCE(string_agg(t.tok, ' ' ORDER BY t.pos)
                              FILTER (WHERE c.cpos IS NULL), '') AS text
            FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
            GROUP BY t.doc_id
        """,
        "simhash": _simhash_oracle(),
        "minhash_lsh": _minhash_oracle(),
        "ann_lsh": _ann_lsh_oracle(),
        "dedup_clusters": _dedup_clusters_oracle(),
        "semantic_dedup": _semantic_dedup_oracle(),
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31) || 's0'), 1, 15))::BIGINT
                  % 1000000
                  < CASE lang WHEN 'en' THEN 300000
                              WHEN 'zh' THEN 800000
                              WHEN 'es' THEN 800000
                              ELSE 500000 END
        """,
        "chunk_documents": """
            WITH w AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM documents),
            c AS (
              SELECT doc_id, ws,
                     CASE WHEN len(ws) <= 12 THEN 1
                          ELSE 1 + CAST(FLOOR((len(ws) - 12 + 7) / 8.0) AS INT)
                     END AS n_chunks
              FROM w)
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_id,
                   CAST(len(list_slice(ws, 1 + (i - 1) * 8, (i - 1) * 8 + 12)) AS BIGINT)
                     AS n_tokens,
                   array_to_string(list_slice(ws, 1 + (i - 1) * 8, (i - 1) * 8 + 12), ' ')
                     AS chunk_text
            FROM c, UNNEST(range(1, n_chunks + 1)) AS t(i)
        """,
        "pack_sequences": """
            WITH d AS (
              SELECT doc_id,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8
                       AS bucket,
                     CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                       AS n_tokens
              FROM documents),
            s AS (
              SELECT doc_id, bucket, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tokens
                       AS cum_before
              FROM d)
            SELECT doc_id, bucket,
                   CAST(FLOOR(cum_before / 32.0) AS BIGINT) AS seq_id,
                   CAST(cum_before % 32 AS BIGINT) AS offset_in_seq,
                   n_tokens
            FROM s
        """,
        "decontaminate": """
            WITH w AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM documents),
            g AS (
              SELECT doc_id,
                     ('0x' || substr(md5(array_to_string(list_slice(ws, i, i + 2), ' ')),
                      1, 15))::BIGINT AS gram
              FROM w, UNNEST(range(1, GREATEST(len(ws) - 2, 0) + 1)) AS t(i)),
            gd AS (SELECT DISTINCT doc_id, gram FROM g),
            bench AS (SELECT DISTINCT gram FROM gd WHERE doc_id % 20 = 0),
            corpus AS (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0),
            shared AS (
              SELECT gd.doc_id, COUNT(*) AS n
              FROM gd JOIN bench USING (gram)
              WHERE gd.doc_id % 20 <> 0
              GROUP BY 1)
            SELECT c.doc_id,
                   CAST(COALESCE(s.n, 0) AS BIGINT) AS n_shared_grams,
                   CAST(CASE WHEN COALESCE(s.n, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
                     AS is_contaminated
            FROM corpus c LEFT JOIN shared s USING (doc_id)
        """,
        "unigram_logprob": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            cf AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY 1),
            tot AS (SELECT SUM(cf) AS total FROM cf),
            lp AS (SELECT term, CAST(ROUND(ln(cf / total) * 1000000) AS BIGINT) AS lp_micro
                   FROM cf CROSS JOIN tot)
            SELECT t.doc_id,
                   CAST(SUM(t.tf) AS BIGINT) AS n_tokens,
                   CAST(SUM(t.tf * l.lp_micro) AS BIGINT) AS logprob_micro
            FROM tf t JOIN lp l USING (term)
            GROUP BY 1
        """,
        "tfidf_vectors": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT COUNT(*) AS n_docs FROM documents),
            idf AS (
              SELECT term,
                     CAST(ROUND((ln((n_docs + 1.0) / (df + 1.0)) + 1) * 1000000)
                          AS BIGINT) AS idf_micro,
                     ('0x' || substr(md5(term), 1, 15))::BIGINT % 64 AS bucket,
                     CASE WHEN ('0x' || substr(md5(term), 16, 1))::BIGINT % 2 = 0
                          THEN 1 ELSE -1 END AS sign
              FROM dfreq CROSS JOIN n)
            SELECT t.doc_id, i.bucket,
                   CAST(SUM(i.sign * t.tf * i.idf_micro) AS BIGINT) AS w_micro
            FROM tf t JOIN idf i USING (term)
            GROUP BY 1, 2
        """,
        "term_stats": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents),
            pd AS (SELECT doc_id, term, COUNT(*) AS tf
                   FROM toks GROUP BY 1, 2)
            SELECT term,
                   CAST(COUNT(*) AS BIGINT) AS doc_freq,
                   CAST(SUM(tf) AS BIGINT) AS collection_freq,
                   CAST(MAX(tf) AS BIGINT) AS max_tf
            FROM pd GROUP BY 1
        """,
        "ngram_repetition": """
            WITH w AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM documents),
            b AS (
              SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg
              FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
            c AS (SELECT doc_id, bg, COUNT(*) AS n FROM b GROUP BY 1, 2),
            a AS (SELECT doc_id, MAX(n) AS top, SUM(n) AS tot,
                         COUNT(*) AS dist
                  FROM c GROUP BY 1)
            SELECT d.doc_id,
                   CAST(COALESCE(a.top, 0) AS BIGINT) AS top_ngram_count,
                   CAST(COALESCE(a.tot, 0) AS BIGINT) AS n_ngrams,
                   CAST(COALESCE(a.dist, 0) AS BIGINT) AS n_distinct_ngrams,
                   CAST(CASE WHEN COALESCE(a.tot, 0) > 0
                              AND COALESCE(a.top, 0) * 5 >= a.tot
                             THEN 1 ELSE 0 END AS INT) AS is_repetitive
            FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
        """,
        "pii_scrub": """
            WITH aug AS (
              SELECT doc_id, text ||
                CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || doc_id || '@example.com now'
                     ELSE '' END ||
                CASE WHEN doc_id % 5 = 0
                     THEN ' from 10.0.' || (doc_id % 256) || '.1 logged'
                     ELSE '' END ||
                CASE WHEN doc_id % 7 = 0
                     THEN ' call +1555000' ||
                          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END AS t
              FROM documents)
            SELECT doc_id,
              CAST(len(regexp_extract_all(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                AS n_emails,
              CAST(len(regexp_extract_all(t,
                '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}')) AS BIGINT)
                AS n_ipv4,
              CAST(len(regexp_extract_all(t, '\\+\\d{9,15}')) AS BIGINT)
                AS n_phones,
              md5(regexp_replace(regexp_replace(regexp_replace(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}', '<IP>', 'g'),
                '\\+\\d{9,15}', '<PHONE>', 'g')) AS redacted_hash
            FROM aug
        """,
        "url_dedup": """
            WITH raw AS (
              SELECT doc_id,
                CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END || '://' ||
                CASE WHEN doc_id % 3 = 0 THEN 'WWW.Site' || (doc_id % 5) || '.COM'
                     WHEN doc_id % 3 = 1 THEN 'site' || (doc_id % 5) || '.com:80'
                     ELSE 'Site' || (doc_id % 5) || '.com' END ||
                '/a/' || (doc_id // 7) ||
                CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
                CASE WHEN doc_id % 4 = 0 THEN '?b=2&a=1'
                     WHEN doc_id % 4 = 1 THEN '?a=1&utm_source=x&b=2'
                     WHEN doc_id % 4 = 2 THEN '?a=1&b=2&fbclid=' || doc_id
                     ELSE '?b=2&a=1&utm_campaign=yy' END ||
                CASE WHEN doc_id % 5 = 0 THEN '#sec' || (doc_id % 7) ELSE '' END
                  AS url
              FROM documents),
            nf AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw),
            parts AS (
              SELECT doc_id,
                lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                regexp_replace(
                  lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
                  '^www\\.', '') AS hp,
                regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS p,
                regexp_extract(u, '\\?([^#]*)', 1) AS q
              FROM nf),
            canon AS (
              SELECT doc_id,
                scheme || '://' ||
                CASE WHEN scheme = 'http' THEN regexp_replace(hp, ':80$', '')
                     WHEN scheme = 'https' THEN regexp_replace(hp, ':443$', '')
                     ELSE hp END ||
                CASE WHEN p = '' THEN '/'
                     WHEN p = '/' THEN '/'
                     ELSE regexp_replace(p, '/$', '') END ||
                CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
                     ELSE '' END AS canonical_url
              FROM (
                SELECT *,
                  list_sort(list_filter(string_split(q, '&'),
                    x -> x <> '' AND NOT regexp_matches(x,
                      '^(utm_[a-z]+|fbclid|gclid|ref|mc_cid|mc_eid)='))) AS kept
                FROM parts))
            SELECT canonical_url,
                   MIN(doc_id) AS keep_doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM canon
            GROUP BY canonical_url
        """,
        "winnowing": """
            WITH w AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM documents),
            g AS (
              SELECT doc_id, i, array_to_string(ws[i:i+2], ' ') AS kg
              FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
            h AS (
              SELECT doc_id, i,
                     CAST(('0x' || substr(md5(kg), 1, 15)) AS BIGINT) AS hv
              FROM g),
            n AS (SELECT doc_id, MAX(i) AS n_sh FROM h GROUP BY 1),
            m AS (
              SELECT doc_id, i,
                     MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
                                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                       AS fp
              FROM h)
            SELECT DISTINCT m.doc_id, m.fp AS fingerprint
            FROM m JOIN n ON m.doc_id = n.doc_id
            WHERE m.i <= n.n_sh - 3
        """,
        "route_url2extid": """
            WITH d AS (
              SELECT c_custkey AS custkey,
                CASE WHEN c_custkey % 4 = 0 THEN 'https://viaf.org/viaf/' || c_custkey
                     WHEN c_custkey % 4 = 1 THEN 'https://d-nb.info/gnd/' || c_custkey
                     WHEN c_custkey % 4 = 2 THEN 'https://www.idref.fr/' || c_custkey
                     ELSE 'https://example.org/' || c_custkey END AS url
              FROM customer)
            SELECT custkey,
                   CASE WHEN regexp_matches(url, '^https://viaf\\.org/viaf/\\d+$') THEN 214
                        WHEN regexp_matches(url, '^https://d-nb\\.info/gnd/\\d+$') THEN 227
                        WHEN regexp_matches(url, '^https://www\\.idref\\.fr/\\d+$') THEN 269 END AS property,
                   regexp_extract(url, '/(\\d+)$', 1) AS ext_id
            FROM d
            WHERE url NOT LIKE 'https://example.org/%'
        """,
        "dedup_claims": """
            SELECT l_orderkey AS orderkey, l_partkey AS partkey,
                   COUNT(*) AS n_dup, COUNT(DISTINCT l_suppkey) AS n_refs
            FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1
        """,
        "single_hit_guard": """
            WITH single AS (
              SELECT o_custkey, MIN(o_orderkey) AS orderkey
              FROM orders GROUP BY 1 HAVING COUNT(*) = 1)
            SELECT c.c_custkey AS custkey, s.orderkey
            FROM customer c JOIN single s ON c.c_custkey = s.o_custkey
        """,
        "precision_demotion": """
            SELECT event_id, user_id, CAST(event_id % 3 + 9 AS INT) AS precision,
                   CASE WHEN event_id % 3 + 9 < MAX(event_id % 3 + 9) OVER (PARTITION BY user_id)
                        THEN 'deprecated' ELSE 'normal' END AS rank
            FROM events
        """,
        "first_per_lang": """
            SELECT c_nationkey AS nationkey, c_name AS label
            FROM (SELECT c_nationkey, c_name,
                         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
                  FROM customer) WHERE rn = 1
        """,
        "broadcast_link": """
            SELECT p.p_brand AS brand, COUNT(*) AS n_items,
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1
        """,
        "rescue_join": """
            SELECT o.o_orderkey AS orderkey,
                   COALESCE(n.n_name, 'UNRESOLVED') AS resolved
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN (SELECT * FROM nation WHERE n_regionkey <= 2) n
              ON c.c_nationkey = n.n_nationkey
        """,
        "merge_diff": """
            SELECT o_orderkey AS orderkey, o_orderstatus AS status
            FROM orders WHERE o_orderkey NOT IN
              (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        """,
        "date_precision_parse": """
            WITH d AS (
              SELECT o_orderkey AS orderkey,
                CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y')
                     WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m')
                     ELSE strftime(o_orderdate, '%Y-%m-%d') END AS raw
              FROM orders)
            SELECT orderkey,
                   '+' || substr(raw, 1, 4) || '-' ||
                   CASE WHEN length(raw) >= 7 THEN substr(raw, 6, 2) ELSE '00' END || '-' ||
                   CASE WHEN length(raw) = 10 THEN substr(raw, 9, 2) ELSE '00' END ||
                   'T00:00:00Z' AS wb_time,
                   CAST(CASE WHEN length(raw) = 4 THEN 9
                             WHEN length(raw) = 7 THEN 10 ELSE 11 END AS INT) AS precision
            FROM d
        """,
        "label_transform": """
            WITH d AS (
              SELECT c_custkey AS custkey, c_name || ', ' || c_mktsegment AS raw
              FROM customer)
            SELECT custkey,
                   CASE WHEN len(string_split(raw, ', ')) = 2
                        THEN split_part(raw, ', ', 2) || ' ' || split_part(raw, ', ', 1)
                        ELSE raw END AS label
            FROM d
        """,
        "cc_components": """
            WITH RECURSIVE edges AS (
              SELECT DISTINCT 'o' || l_orderkey AS src, 'p' || l_partkey AS dst
              FROM lineitem WHERE l_orderkey <= 200),
            sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
            reach(a, b) AS (
              SELECT src, dst FROM sym
              UNION
              SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
            nodes AS (SELECT DISTINCT src AS node FROM sym)
            SELECT n.node, LEAST(n.node, MIN(r.b)) AS component
            FROM nodes n LEFT JOIN reach r ON r.a = n.node
            GROUP BY n.node
        """,
        "sessionize": """
            WITH d AS (
              SELECT user_id, ts, event_id,
                CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800 OR LAG(ts) OVER w IS NULL
                     THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id,
                CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS BIGINT) AS session_id
              FROM d)
            SELECT user_id, session_id, COUNT(*) AS n_events
            FROM s GROUP BY 1, 2
        """,
        "pricing_summary": """
            SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                     AS sum_base_price_cents,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY 1, 2
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keep_doc_id
            FROM documents GROUP BY 1
        """,
        "token_count": """
            SELECT source,
                   CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
                     AS total_tokens,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "quality_score": """
            WITH d AS (
              SELECT doc_id, n_chars,
                     len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
              FROM documents)
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars_out,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_chars * 10 // GREATEST(n_tokens, 1) AS BIGINT) AS avg_wordlen_x10,
                   CAST(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END AS INT) AS too_short
            FROM d
        """,
        "lang_id": """
            WITH d AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
              FROM documents),
            h AS (
              SELECT doc_id, len(words) AS n_words,
                     len(list_filter(words, w -> w IN
                       ('the','a','of','and','to','in','is','for','on','with'))) AS hits
              FROM d)
            SELECT doc_id, CAST(hits AS BIGINT) AS stopword_hits,
                   CAST(CASE WHEN hits * 100 >= n_words * 5 THEN 1 ELSE 0 END AS INT) AS looks_english
            FROM h
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                       regexp_split_to_array(trim(text), '\\s+'))), ' ')) AS fingerprint
            FROM documents
        """,
        "ngram_jaccard_pairs": """
            WITH toks AS (
              SELECT DISTINCT doc_id, unnest(list_distinct(
                regexp_split_to_array(trim(text), '\\s+'))) AS tok
              FROM documents WHERE doc_id < 2000),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT i.doc_a, i.doc_b, i.inter AS n_shared
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.doc_a
            JOIN sizes sb ON sb.doc_id = i.doc_b
            WHERE i.inter * 10 >= (sa.sz + sb.sz - i.inter) * 8
        """,
        "ann_cosine_top1": """
            WITH pairs AS (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS cos
              FROM embeddings q JOIN embeddings e ON q.vec_id != e.vec_id
              WHERE q.vec_id < 10)
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS rn
              FROM pairs) WHERE rn = 1
        """,
        "ann_ivf_top1": _ivf_kmeans_oracle(n_iter=2),
        "pq_adc_top5": _pq_oracle(),
        "ivfpq_top5": _ivfpq_oracle(),
        "ivfpq_rerank_top5": _ivfpq_oracle(rerank_shortlist=50),
        "salted_agg": """
            SELECT event_type, COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY 1
        """,
        "dedup_embedding_cosine": """
            WITH base AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
            planted AS (
              SELECT vec_id + 1000000 AS vec_id,
                     list_transform(embedding, x -> x * 1.5) AS embedding
              FROM base WHERE vec_id < 25),
            allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
            pairs AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding, c.embedding) AS cos
              FROM allv q JOIN allv c ON q.vec_id != c.vec_id
              WHERE q.vec_id >= 1000000),
            ranked AS (
              SELECT query_id, neighbor_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS rn
              FROM pairs)
            SELECT query_id, neighbor_id FROM ranked WHERE rn = 1 AND cos >= 0.99
        """,
        # n_bytes/sha256 are decoder-independent payload facts — DuckDB's
        # sha256(VARCHAR) hashes the same utf-8 bytes Spark's encode() emits
        "multimodal_features": """
            SELECT doc_id AS media_id,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS sha256
            FROM documents
            WHERE text IS NOT NULL
        """,
        # range(0, n, step) is end-exclusive == Spark's sequence(0, n-1, step)
        # end-inclusive for the strictly positive durations built here
        "frame_sample_plan": """
            SELECT media_id,
                   UNNEST(range(0, duration_ms, 1000)) AS frame_ts_ms
            FROM (SELECT doc_id AS media_id,
                         (doc_id % 7) * 900 + 500 AS duration_ms
                  FROM documents
                  WHERE doc_id % 5 = 0)
        """,
        # Replays q_resize_images' ENTIRE pixel chain in integer math.
        # Target dims mirror resize_images bit-for-bit: scale is computed
        # FIRST (16.0 / greatest) then multiplied — same IEEE op order as
        # the Python `w * (max_side / max(w, h))` — and floor(x + 0.5)
        # matches Python's int(x + 0.5) HALF_UP exactly. No product can
        # land on an exact .5 tie: that would need greatest(w,h) to carry
        # 2-adic valuation ≥ 5, impossible for dims ≤ 31.
        "resize_images": """
            WITH dims AS (
                SELECT doc_id AS media_id,
                       3 + (doc_id * 7) % 29 AS w,
                       3 + (doc_id * 11) % 23 AS h
                FROM documents
            ),
            t AS (
                SELECT media_id, w, h,
                       greatest(w, h) > 16 AS resized,
                       CASE WHEN greatest(w, h) > 16
                            THEN CAST(floor(w * (16.0 / greatest(w, h)) + 0.5) AS INT)
                            ELSE w END AS out_w,
                       CASE WHEN greatest(w, h) > 16
                            THEN CAST(floor(h * (16.0 / greatest(w, h)) + 0.5) AS INT)
                            ELSE h END AS out_h
                FROM dims
            )
            SELECT t.media_id,
                   t.out_w,
                   t.out_h,
                   t.resized,
                   CAST(SUM((((xs.x * t.w) // t.out_w) * 7
                             + ((ys.y * t.h) // t.out_h) * 13
                             + t.media_id) % 256) AS BIGINT) AS pixel_sum
            FROM t,
                 LATERAL (SELECT UNNEST(range(0, CAST(t.out_w AS BIGINT))) AS x) AS xs,
                 LATERAL (SELECT UNNEST(range(0, CAST(t.out_h AS BIGINT))) AS y) AS ys
            GROUP BY t.media_id, t.out_w, t.out_h, t.resized
        """,
        "dsir_weights": """
            WITH docs AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM documents),
            uni AS (SELECT doc_id, unnest(ws) AS feat FROM docs),
            bi AS (
              SELECT doc_id, array_to_string(list_slice(ws, i, i + 1), ' ') AS feat
              FROM docs, UNNEST(range(1, GREATEST(len(ws) - 1, 0) + 1)) AS t(i)),
            feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
            fb AS (
              SELECT doc_id,
                     ('0x' || substr(md5(feat), 1, 15))::BIGINT % 1024 AS bucket
              FROM feats),
            tgt AS (SELECT bucket FROM fb WHERE doc_id % 10 = 0),
            raw AS (SELECT doc_id, bucket FROM fb WHERE doc_id % 10 <> 0),
            tc AS (SELECT bucket, COUNT(*) AS t_cnt FROM tgt GROUP BY 1),
            rc AS (SELECT bucket, COUNT(*) AS r_cnt FROM raw GROUP BY 1),
            tt AS (SELECT COUNT(*) AS t_total FROM tgt),
            rt AS (SELECT COUNT(*) AS r_total FROM raw),
            spine AS (SELECT UNNEST(range(0, 1024)) AS bucket),
            lr AS (
              SELECT spine.bucket,
                     CAST(ROUND((ln((COALESCE(t_cnt, 0) + 1.0) / (t_total + 1024.0))
                               - ln((COALESCE(r_cnt, 0) + 1.0) / (r_total + 1024.0)))
                               * 1000000) AS BIGINT) AS lr_micro
              FROM spine LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
                   CROSS JOIN tt CROSS JOIN rt),
            tf AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM raw GROUP BY 1, 2)
            SELECT t.doc_id,
                   CAST(SUM(t.tf) AS BIGINT) AS n_features,
                   CAST(SUM(t.tf * l.lr_micro) AS BIGINT) AS dsir_micro
            FROM tf t JOIN lr l USING (bucket)
            GROUP BY 1
        """,
        "cms_heavy_hitters": """
            WITH toks AS (
              SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents),
            cells AS (
              SELECT j AS rw,
                     ('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || chr(31) || term),
                      1, 15))::BIGINT % 256 AS bucket,
                     COUNT(*) AS cnt
              FROM toks, UNNEST([0, 1, 2, 3]) AS t(j)
              GROUP BY 1, 2),
            exact AS (SELECT term, COUNT(*) AS exact_cnt FROM toks GROUP BY 1),
            tot AS (SELECT SUM(exact_cnt) AS total FROM exact),
            probes AS (
              SELECT term, exact_cnt, j AS rw,
                     ('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || chr(31) || term),
                      1, 15))::BIGINT % 256 AS bucket
              FROM exact, UNNEST([0, 1, 2, 3]) AS t(j)),
            est AS (
              SELECT p.term, p.exact_cnt, MIN(c.cnt) AS cms_est
              FROM probes p JOIN cells c USING (rw, bucket)
              GROUP BY 1, 2)
            SELECT term,
                   CAST(cms_est AS BIGINT) AS cms_est,
                   CAST(exact_cnt AS BIGINT) AS exact_cnt
            FROM est CROSS JOIN tot
            WHERE cms_est * 1000000 >= total * 5000
        """,
        "bloom_cross_dedup": """
            WITH seen AS (
              SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 2 = 0),
            inc AS (
              SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 2 <> 0
              UNION ALL
              SELECT doc_id + 1000000, md5(text) FROM documents
              WHERE doc_id % 2 = 0 AND doc_id < 100),
            seen_pos AS (
              SELECT DISTINCT
                     ('0x' || substr(md5('bloom' || CAST(j AS VARCHAR) || chr(31) || fp),
                      1, 15))::BIGINT % 65536 AS pos
              FROM seen, UNNEST([0, 1, 2]) AS t(j)),
            inc_pos AS (
              SELECT DISTINCT doc_id,
                     ('0x' || substr(md5('bloom' || CAST(j AS VARCHAR) || chr(31) || fp),
                      1, 15))::BIGINT % 65536 AS pos
              FROM inc, UNNEST([0, 1, 2]) AS t(j)),
            own AS (SELECT doc_id, COUNT(*) AS n_pos FROM inc_pos GROUP BY 1),
            hit AS (
              SELECT i.doc_id, COUNT(*) AS n_hit
              FROM inc_pos i JOIN seen_pos s USING (pos)
              GROUP BY 1)
            SELECT o.doc_id,
                   CAST(CASE WHEN COALESCE(h.n_hit, 0) = o.n_pos THEN 1 ELSE 0 END
                        AS INT) AS maybe_seen
            FROM own o LEFT JOIN hit h USING (doc_id)
        """,
        "bigram_logprob": """
            WITH w AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM documents),
            bi AS (
              SELECT doc_id, array_to_string(list_slice(ws, i, i + 1), ' ') AS gram
              FROM w, UNNEST(range(1, GREATEST(len(ws) - 1, 0) + 1)) AS t(i)),
            doc_bi AS (SELECT doc_id, gram, COUNT(*) AS tf FROM bi GROUP BY 1, 2),
            bc AS (SELECT gram, SUM(tf) AS bc FROM doc_bi GROUP BY 1),
            toks AS (
              SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents),
            uc AS (SELECT term, COUNT(*) AS uc FROM toks GROUP BY 1),
            v AS (SELECT COUNT(*) AS v FROM uc),
            lp AS (
              SELECT gram,
                     CAST(ROUND(ln((bc + 1.0) / (uc + v)) * 1000000) AS BIGINT)
                       AS lp_micro
              FROM bc JOIN uc ON uc.term = split_part(bc.gram, ' ', 1)
                   CROSS JOIN v)
            SELECT d.doc_id,
                   CAST(SUM(d.tf) AS BIGINT) AS n_bigrams,
                   CAST(SUM(d.tf * l.lp_micro) AS BIGINT) AS logprob2_micro
            FROM doc_bi d JOIN lp l USING (gram)
            GROUP BY 1
        """,
        "mix_report": """
            WITH per AS (
              SELECT lang AS stratum,
                     len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
              FROM documents),
            agg AS (
              SELECT stratum, COUNT(*) AS n_docs, SUM(n_tokens) AS n_tokens
              FROM per GROUP BY 1),
            tot AS (SELECT SUM(n_tokens) AS total FROM agg)
            SELECT stratum,
                   CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_tokens * 1000000 // total AS BIGINT) AS share_ppm
            FROM agg CROSS JOIN tot
        """,
        "asof_clicks": """
            WITH errors AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
            clicks AS (
              SELECT user_id, ts, MAX(event_id) AS click_id
              FROM events WHERE event_type = 'click' GROUP BY 1, 2)
            SELECT e.event_id,
                   CAST(COALESCE(c.click_id, -1) AS BIGINT) AS click_id,
                   CAST(COALESCE(epoch_us(e.ts) - epoch_us(c.ts), -1) AS BIGINT)
                     AS gap_micros
            FROM errors e
            ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts >= c.ts
        """,
        "range_join_windows": """
            WITH wins AS (
              SELECT event_id AS win_id, user_id, ts AS start_ts,
                     ts + INTERVAL 6 HOUR AS end_ts
              FROM events WHERE event_type = 'purchase')
            SELECT e.event_id, w.win_id
            FROM events e JOIN wins w
              ON e.user_id = w.user_id
             AND e.ts >= w.start_ts AND e.ts < w.end_ts
        """,
        "pagerank": _pagerank_oracle(3),
        "ppr_proximity": _pagerank_oracle(3, seed_where="l_orderkey <= 10"),
        "khop_parts": _khop_oracle(3),
        "jaccard_candidates": """
            WITH li AS (
              SELECT DISTINCT l_orderkey, l_partkey
              FROM lineitem WHERE l_orderkey <= 2000),
            e AS (
              SELECT DISTINCT
                     CAST(LEAST(a.l_partkey, b.l_partkey) AS VARCHAR) AS a,
                     CAST(GREATEST(a.l_partkey, b.l_partkey) AS VARCHAR) AS b
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey <> b.l_partkey),
            deg AS (
              SELECT node, COUNT(*) AS deg FROM (
                SELECT a AS node FROM e UNION ALL SELECT b FROM e)
              GROUP BY node),
            nbr AS (SELECT a AS c, b AS n FROM e
                    UNION ALL SELECT b AS c, a AS n FROM e),
            -- the graph-stopword cap: hubs drop out of the COMMON side
            nbrc AS (
              SELECT nbr.c, nbr.n FROM nbr
              JOIN deg ON nbr.c = deg.node WHERE deg.deg <= 40),
            com AS (
              SELECT n1.n AS x, n2.n AS y, COUNT(*) AS common
              FROM nbrc n1 JOIN nbrc n2 ON n1.c = n2.c AND n1.n < n2.n
              GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT com.x AS node_a, com.y AS node_b,
                   CAST(com.common AS BIGINT) AS common,
                   CAST((com.common * 1000000)
                        // (dx.deg + dy.deg - com.common) AS BIGINT)
                     AS jaccard_micro
            FROM com JOIN deg dx ON com.x = dx.node
                     JOIN deg dy ON com.y = dy.node
            WHERE (com.common * 1000000)
                    // (dx.deg + dy.deg - com.common) >= 100000
        """,
        "triangle_count": """
            WITH li AS (
              SELECT DISTINCT l_orderkey, l_partkey
              FROM lineitem WHERE l_orderkey <= 2000),
            e AS (
              SELECT DISTINCT
                     CAST(LEAST(a.l_partkey, b.l_partkey) AS VARCHAR) AS a,
                     CAST(GREATEST(a.l_partkey, b.l_partkey) AS VARCHAR) AS b
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey <> b.l_partkey),
            tri AS (
              -- id-ordered enumeration: x<y<z, edges (x,y),(y,z),(x,z);
              -- same triangle SET as Spark's degree-oriented wedges
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e e1 JOIN e e2 ON e2.a = e1.b
                        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            members AS (
              SELECT x AS node FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM members GROUP BY node
        """,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: KG-primitive composite on sf0.001 — single-hit guard
    feeding a broadcast link with window demotion, the pipeline's core
    join/agg shapes on the driver's smallest tables."""
    sf_dir = "/root/testdata/sf0.001"
    return q_pricing_summary(spark, sf_dir)

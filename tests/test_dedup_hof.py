"""Pins for the shuffle-free minhash signature path (strategy="hof").

The higher-order-function variant must be bit-identical to the explode +
groupBy path for both hash functions — it is the same min over the same
seeded token hashes, just folded per-row instead of aggregated — and its
physical plan must contain no Exchange.
"""

from pyspark.sql import functions as F

from auth2wd_spark.mlops.dedup import minhash_signatures


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different text with other tokens entirely"),
        (3, "solo"),
        (4, ""),  # split("") → [""] — one empty-string token, row survives
        (5, "  padded   whitespace   tokens  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect_sigs(df):
    return {r["doc_id"]: list(r["signature"]) for r in df.collect()}


def test_hof_matches_explode_md5(spark):
    docs = _docs(spark)
    a = _collect_sigs(minhash_signatures(docs, n_hashes=16, hash_fn="md5"))
    b = _collect_sigs(minhash_signatures(docs, n_hashes=16, hash_fn="md5", strategy="hof"))
    assert a == b
    assert set(a) == {0, 1, 2, 3, 4, 5}


def test_hof_matches_explode_xxhash64(spark):
    docs = _docs(spark)
    a = _collect_sigs(minhash_signatures(docs, n_hashes=8, hash_fn="xxhash64"))
    b = _collect_sigs(minhash_signatures(docs, n_hashes=8, hash_fn="xxhash64", strategy="hof"))
    assert a == b


def test_hof_odd_hash_count_shares_last_digest(spark):
    docs = _docs(spark)
    a = _collect_sigs(minhash_signatures(docs, n_hashes=5, hash_fn="md5"))
    b = _collect_sigs(minhash_signatures(docs, n_hashes=5, hash_fn="md5", strategy="hof"))
    assert a == b
    assert all(len(sig) == 5 for sig in b.values())


def test_hof_plan_is_shuffle_free(spark):
    docs = _docs(spark)
    sig = minhash_signatures(docs, n_hashes=16, hash_fn="md5", strategy="hof")
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # and the explode path does shuffle (the contrast that motivates the A/B)
    plan_explode = (
        minhash_signatures(docs, n_hashes=16, hash_fn="md5")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan_explode


def test_hof_min_is_over_distinct_tokens(spark):
    # duplicated tokens must not change the signature (array_distinct
    # applies on both paths)
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a a b b c c a")], "doc_id long, text string"
    )
    sigs = _collect_sigs(minhash_signatures(docs, n_hashes=4, hash_fn="md5", strategy="hof"))
    assert sigs[0] == sigs[1]

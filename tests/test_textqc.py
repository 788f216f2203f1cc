"""Pins for mlops/textqc.py: n-gram repetition, PII scrub, winnowing.

Each operator gets a hand-computed golden case plus a physical-plan
assertion that the shuffle-free operators really are shuffle-free.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from auth2wd_spark.mlops.textqc import (
    ngram_repetition,
    pii_scrub,
    winnowing_fingerprints,
)


@pytest.fixture()
def docs(spark):
    rows = [
        # doc 0: "a b a b a" → bigrams [a b, b a, a b, b a]: top 2 of 4
        (0, "a b a b a"),
        # doc 1: top bigram ("x x") is 3 of 3 → repetitive
        (1, "x x x x"),
        # doc 2: one token → no bigrams, zeros
        (2, "solo"),
        # doc 3: all-distinct bigrams, not repetitive (top 1 of 9, < 20%)
        (3, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_repetition_golden(docs):
    out = {r["doc_id"]: r for r in ngram_repetition(docs, n=2).collect()}
    assert len(out) == 4
    assert (out[0]["top_ngram_count"], out[0]["n_ngrams"], out[0]["n_distinct_ngrams"]) == (2, 4, 2)
    assert out[0]["is_repetitive"] == 1  # 2*5 >= 4
    assert (out[1]["top_ngram_count"], out[1]["n_ngrams"]) == (3, 3)
    assert out[1]["is_repetitive"] == 1
    assert (out[2]["top_ngram_count"], out[2]["n_ngrams"], out[2]["is_repetitive"]) == (0, 0, 0)
    assert (out[3]["top_ngram_count"], out[3]["n_ngrams"], out[3]["n_distinct_ngrams"]) == (1, 9, 9)
    assert out[3]["is_repetitive"] == 0


def test_pii_scrub_golden(spark):
    text = (
        "write to jane.doe+spam@mail.example.org or call +4915551234567 "
        "from 192.168.0.1 and 10.0.0.2; not-pii: a@b (no tld), +123 (short)"
    )
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    row = pii_scrub(df).collect()[0]
    assert row["n_emails"] == 1
    assert row["n_ipv4"] == 2
    assert row["n_phones"] == 1
    expected = (
        "write to <EMAIL> or call <PHONE> "
        "from <IP> and <IP>; not-pii: a@b (no tld), +123 (short)"
    )
    assert row["redacted_hash"] == hashlib.md5(expected.encode()).hexdigest()


def test_pii_scrub_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _py_winnow(tokens, k=3, w=4):
    """Reference implementation: md5-based shingle hashes, min per window."""
    shingles = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    hashes = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shingles]
    if len(hashes) < w:
        return set()
    return {min(hashes[j : j + w]) for j in range(len(hashes) - w + 1)}


def test_winnowing_golden(spark):
    toks = ["w%d" % (i % 5) for i in range(12)]  # repeating tokens → dup shingles
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    got = {r["fingerprint"] for r in winnowing_fingerprints(df, k=3, w=4).collect()}
    assert got == _py_winnow(toks)


def test_winnowing_shared_run_guarantee(spark):
    # two docs sharing a run of w+k-1 = 6 tokens must share a fingerprint
    shared = "s1 s2 s3 s4 s5 s6"
    df = spark.createDataFrame(
        [(1, "p1 p2 p3 " + shared), (2, shared + " q1 q2 q3")],
        "doc_id long, text string",
    )
    rows = winnowing_fingerprints(df, k=3, w=4).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fingerprint"])
    assert fps[1] & fps[2], "shared 6-token run must yield a shared fingerprint"


def test_winnowing_short_doc_empty(spark):
    # k+w-1 = 6 tokens is the minimum; 5 tokens → no full window → no rows
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    assert winnowing_fingerprints(df, k=3, w=4).count() == 0


def test_winnowing_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    plan = (
        winnowing_fingerprints(df, k=3, w=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_term_stats_golden(spark):
    from auth2wd_spark.mlops.textqc import term_stats

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string"
    )
    out = {r["term"]: r for r in term_stats(df).collect()}
    assert (out["a"]["doc_freq"], out["a"]["collection_freq"], out["a"]["max_tf"]) == (1, 2, 2)
    assert (out["b"]["doc_freq"], out["b"]["collection_freq"], out["b"]["max_tf"]) == (2, 2, 1)
    assert (out["c"]["doc_freq"], out["c"]["collection_freq"], out["c"]["max_tf"]) == (1, 1, 1)
    assert term_stats(df, min_doc_freq=2).count() == 1  # only "b"


def test_dedup_clusters_identical_trio(spark):
    """Three byte-identical docs collapse to one canonical id (the numeric
    minimum); the unrelated singleton maps to itself; every input doc_id
    appears exactly once."""
    from auth2wd_spark.mlops.dedup import dedup_clusters

    same = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(10, same), (2, same), (7, same), (99, "completely different words here entirely")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["canonical_doc_id"] for r in dedup_clusters(df, hash_fn="md5").collect()}
    assert out == {2: 2, 7: 2, 10: 2, 99: 99}


def test_dedup_clusters_numeric_min_not_lexicographic(spark):
    """doc ids 9 and 10 in one cluster: canonical must be 9 (numeric min),
    which the zero-padding guarantees despite CC's lexicographic-min
    string contract ('10' < '9' as strings)."""
    from auth2wd_spark.mlops.dedup import dedup_clusters

    same = "one two three four five six seven eight"
    df = spark.createDataFrame([(9, same), (10, same)], "doc_id long, text string")
    out = {r["doc_id"]: r["canonical_doc_id"] for r in dedup_clusters(df, hash_fn="md5").collect()}
    assert out == {9: 9, 10: 9}


def test_verify_candidates_jaccard(spark):
    """Exact verification keeps only candidates at/above the threshold:
    docs 1/3 are identical (J=1.0, kept); docs 1/2 share 4 of 6 distinct
    tokens (J≈0.67 < 0.8, dropped) even though both arrive as candidates."""
    from auth2wd_spark.mlops.dedup import verify_candidates_jaccard

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")
    out = verify_candidates_jaccard(docs, pairs, threshold_pct=80).collect()
    assert [(r["doc_a"], r["doc_b"], r["n_shared"], r["sz_a"], r["sz_b"]) for r in out] == [
        (1, 3, 5, 5, 5)
    ]


def test_dedup_clusters_verified_drops_low_jaccard_edges(spark):
    """With verification on, an LSH-candidate pair below the Jaccard
    threshold must not merge: identical docs still cluster, the 4-of-6
    overlap doc stays its own canonical."""
    from auth2wd_spark.mlops.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["canonical_doc_id"]
        for r in dedup_clusters(docs, hash_fn="md5", verify_threshold_pct=80).collect()
    }
    assert out[1] == 1 and out[3] == 1
    assert out[2] == 2


def test_tfidf_vectors_golden(spark):
    """Hand-computed feature-hashed TF-IDF on a 3-doc corpus: buckets and
    signs from md5 (replayed with hashlib), idf_micro = round((ln((N+1)/
    (df+1))+1)*1e6), bucket weight = exact signed BIGINT sum."""
    import hashlib
    import math

    from auth2wd_spark.mlops.textqc import tfidf_vectors

    docs = [(0, "a a b"), (1, "b c"), (2, "c c c a")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r["doc_id"], r["bucket"]): r["w_micro"] for r in tfidf_vectors(df, dim=8).collect()}

    def bucket_sign(term):
        h = hashlib.md5(term.encode()).hexdigest()
        return int(h[:15], 16) % 8, 1 if int(h[15], 16) % 2 == 0 else -1

    dfreq = {"a": 2, "b": 2, "c": 2}
    expected = {}
    for doc_id, text in docs:
        tf = {}
        for t in text.split():
            tf[t] = tf.get(t, 0) + 1
        for t, f in tf.items():
            idf_micro = round((math.log((3 + 1.0) / (dfreq[t] + 1.0)) + 1) * 1_000_000)
            b, s = bucket_sign(t)
            expected[(doc_id, b)] = expected.get((doc_id, b), 0) + s * f * idf_micro
    assert out == expected


def test_tfidf_vectors_collision_sums(spark):
    """Two terms hashed to the same bucket must sum (signed) in one row —
    force a collision with dim=1."""
    from auth2wd_spark.mlops.textqc import tfidf_vectors

    df = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    out = tfidf_vectors(df, dim=1).collect()
    assert len(out) == 1 and out[0]["bucket"] == 0


def test_unigram_logprob_golden(spark):
    """Hand-replay on a 2-doc corpus: cf(a)=3, cf(b)=1, total=4;
    lp_micro(a)=round(ln(3/4)*1e6), lp_micro(b)=round(ln(1/4)*1e6);
    doc sums are exact integer combinations."""
    import math

    from auth2wd_spark.mlops.textqc import unigram_logprob

    df = spark.createDataFrame([(0, "a a b"), (1, "a")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    lp_a = round(math.log(3 / 4) * 1_000_000)
    lp_b = round(math.log(1 / 4) * 1_000_000)
    assert (out[0]["n_tokens"], out[0]["logprob_micro"]) == (3, 2 * lp_a + lp_b)
    assert (out[1]["n_tokens"], out[1]["logprob_micro"]) == (1, lp_a)
    # the doc containing the rare token scores lower per token than the
    # all-common-token doc
    assert out[0]["logprob_micro"] / 3 < out[1]["logprob_micro"] / 1


def test_stratified_sample_deterministic_and_rated(spark):
    """Same input+salt → identical sample; rate 0 drops a stratum, rate
    1e6 keeps one whole, and a fresh salt draws a different subset."""
    from auth2wd_spark.mlops.sampling import stratified_sample

    rows = [(i, "en" if i % 2 == 0 else "de", "t") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    rates = {"en": 1_000_000, "de": 0}
    a = sorted(r["doc_id"] for r in stratified_sample(df, rates).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, rates).collect())
    assert a == b == [i for i in range(400) if i % 2 == 0]

    half = stratified_sample(df, {"en": 500_000}, default_ppm=500_000)
    ids_s0 = {r["doc_id"] for r in half.collect()}
    ids_s1 = {
        r["doc_id"]
        for r in stratified_sample(
            df, {"en": 500_000}, default_ppm=500_000, salt="s1"
        ).collect()
    }
    # Bernoulli(0.5) over 400 ids: both land near 200 and differ by salt
    assert 130 <= len(ids_s0) <= 270 and 130 <= len(ids_s1) <= 270
    assert ids_s0 != ids_s1


def test_stratified_sample_shuffle_free(spark):
    from auth2wd_spark.mlops.sampling import stratified_sample

    df = spark.createDataFrame([(1, "en", "x")], "doc_id long, lang string, text string")
    plan = stratified_sample(df, {"en": 500_000})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bigram_logprob_penalizes_scrambled_order(spark):
    """The discriminative pin: a scrambled doc keeps its UNIGRAM score
    but collapses under the conditional bigram model."""
    from auth2wd_spark.mlops.textqc import bigram_logprob, unigram_logprob

    fluent = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"  # same multiset of tokens
    rows = [(i, fluent) for i in range(20)] + [(100, scrambled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {r["doc_id"]: r["logprob_micro"] for r in unigram_logprob(df).collect()}
    assert uni[100] == uni[0]  # unigram model cannot see word order
    bi = {r["doc_id"]: r["logprob2_micro"] for r in bigram_logprob(df).collect()}
    assert bi[100] < bi[0]  # bigram model can


def test_bigram_logprob_golden(spark):
    """Hand-replay on a 2-doc corpus: every count small enough to check
    with math.log directly."""
    import math

    from auth2wd_spark.mlops.textqc import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    # unigram counts: a→3, b→3; V=2
    # bigram counts: "a b"→3, "b a"→1
    lp_ab = round(math.log((3 + 1.0) / (3 + 2)) * 1e6)
    lp_ba = round(math.log((1 + 1.0) / (3 + 2)) * 1e6)
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert out[1]["n_bigrams"] == 3
    assert out[1]["logprob2_micro"] == 2 * lp_ab + lp_ba
    assert out[2]["n_bigrams"] == 1
    assert out[2]["logprob2_micro"] == lp_ab


def test_bigram_logprob_short_doc_absent(spark):
    from auth2wd_spark.mlops.textqc import bigram_logprob

    df = spark.createDataFrame([(1, "only"), (2, "a b")], "doc_id long, text string")
    ids = {r["doc_id"] for r in bigram_logprob(df).collect()}
    assert ids == {2}  # <2 tokens → no bigrams → absent (winnowing domain rule)


def test_mix_report_golden(spark):
    from auth2wd_spark.mlops.textqc import mix_report

    df = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "en", "d e f"), (3, "zh", "x y")],
        "doc_id long, lang string, text string",
    )
    out = {r["stratum"]: r for r in mix_report(df).collect()}
    assert out["en"]["n_docs"] == 2 and out["en"]["n_tokens"] == 6
    assert out["zh"]["n_docs"] == 1 and out["zh"]["n_tokens"] == 2
    assert out["en"]["share_ppm"] == 6 * 1_000_000 // 8  # exact BIGINT div
    assert out["zh"]["share_ppm"] == 2 * 1_000_000 // 8

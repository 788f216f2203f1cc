"""Golden pins for the sequence-shaping operators (mlops/chunking) and
benchmark decontamination (mlops/dedup.decontaminate)."""

from pyspark.sql import functions as F

from auth2wd_spark.mlops.chunking import chunk_documents, pack_sequences
from auth2wd_spark.mlops.dedup import decontaminate


def test_chunk_documents_boundaries(spark):
    """10 tokens, chunk=4, overlap=1 (stride 3): n_chunks = 1 +
    ceil((10-4)/3) = 3, starts 1/4/7 — the last chunk ends exactly on
    the final token and no pure-overlap tail is emitted; texts pin the
    one-token overlap content."""
    text = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = sorted(
        (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    )
    assert out == [
        (1, 4, "t1 t2 t3 t4"),
        (2, 4, "t4 t5 t6 t7"),
        (3, 4, "t7 t8 t9 t10"),
    ]


def test_chunk_documents_short_tail(spark):
    """11 tokens, chunk=4, stride 3: n_chunks = 1 + ceil(7/3) = 4, the
    last chunk starts at 10 and is short (t10 t11) — tail coverage."""
    text = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = sorted(
        (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    )
    assert out[-1] == (4, 2, "t10 t11")
    assert len(out) == 4


def test_chunk_documents_single_chunk_and_exact_fit(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b c d")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc[0]) == 1 and per_doc[0][0]["chunk_text"] == "a b"
    # exactly chunk_tokens tokens: one chunk, no pure-overlap tail
    assert len(per_doc[1]) == 1 and per_doc[1][0]["n_tokens"] == 4


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_pack_sequences_running_total(spark):
    """Single bucket (n_buckets=1): doc order 0,1,2 with 10/30/5 tokens at
    capacity 32 → cum_before 0/10/40 → seq 0/0/1, offsets 0/10/8. Doc 1
    straddles the capacity boundary (concat-and-split semantics)."""
    rows = [(0, " ".join(["w"] * 10)), (1, " ".join(["w"] * 30)), (2, " ".join(["w"] * 5))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, capacity_tokens=32, n_buckets=1).collect()}
    assert (out[0]["seq_id"], out[0]["offset_in_seq"]) == (0, 0)
    assert (out[1]["seq_id"], out[1]["offset_in_seq"]) == (0, 10)
    assert (out[2]["seq_id"], out[2]["offset_in_seq"]) == (1, 8)
    assert out[2]["bucket"] == 0


def test_pack_sequences_buckets_partition_streams(spark):
    """With several buckets, offsets restart per bucket and every doc
    appears exactly once."""
    rows = [(i, "w w w") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, capacity_tokens=10, n_buckets=4).collect()
    assert len(out) == 100
    firsts = {}
    for r in sorted(out, key=lambda r: (r["bucket"], r["doc_id"])):
        firsts.setdefault(r["bucket"], r)
    for r in firsts.values():  # first doc of each stream starts at 0/0
        assert (r["seq_id"], r["offset_in_seq"]) == (0, 0)


def test_decontaminate_flags_shared_kgram(spark):
    """Doc 10 copies a benchmark 3-gram → flagged with 1 shared gram; doc
    11 is disjoint → clean; doc 12 is shorter than k → clean."""
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "x alpha beta gamma y"),
            (11, "p q r s t"),
            (12, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, k=3).collect()}
    assert (out[10]["n_shared_grams"], out[10]["is_contaminated"]) == (1, 1)
    assert (out[11]["n_shared_grams"], out[11]["is_contaminated"]) == (0, 0)
    assert (out[12]["n_shared_grams"], out[12]["is_contaminated"]) == (0, 0)


def test_decontaminate_counts_distinct_grams_once(spark):
    """A gram repeated in the corpus doc counts once (distinct-before-
    join contract)."""
    bench = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(10, "a b c z a b c")], "doc_id long, text string"
    )
    out = decontaminate(corpus, bench, k=3).collect()[0]
    assert out["n_shared_grams"] == 1


def test_chunk_documents_shuffle_free(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(df, chunk_tokens=4, overlap=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan

"""Pins for BPE tokenizer training (mlops/bpe.py). DuckDB equivalence
is in test_oracle.py; these pin the algorithm against the classic
Sennrich example, an independent plain-Python reference on a random
corpus, and the determinism/plan contracts."""

import random

from pyspark.sql import functions as F

from auth2wd_spark.mlops.bpe import bpe_segment, train_bpe


def _ref_bpe(word_cnt, n):
    """Independent greedy BPE: dict/loops only, no Spark, no strings-
    with-sentinels — left-to-right non-overlapping merge per word."""
    segs = {w: tuple(list(w) + ["</w>"]) for w in word_cnt}
    merges = []
    for _ in range(n):
        pc = {}
        for w, c in word_cnt.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, l + r, cnt))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = tuple(out)
    return merges, segs


def test_sennrich_example(spark):
    """The ACL-2016 worked example: low×5 lower×2 newest×6 widest×3
    learns es, est, est</w>, lo, low, ew in that order."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [(r["l"], r["r"], r["merged"], r["pair_cnt"])
           for r in train_bpe(df, n_merges=6).orderBy("it").collect()]
    assert got == [
        ("e", "s", "es", 9),
        ("es", "t", "est", 9),
        ("est", "</w>", "est</w>", 9),
        ("l", "o", "lo", 7),
        ("lo", "w", "low", 7),
        ("e", "w", "ew", 6),
    ]
    seg = {r["word"]: list(r["pieces"]) for r in bpe_segment(df, n_merges=6).collect()}
    assert seg["low"] == ["low", "</w>"]
    assert seg["newest"] == ["n", "ew", "est</w>"]
    assert seg["widest"] == ["w", "i", "d", "est</w>"]


def test_random_corpus_matches_python_reference(spark):
    """80 random words over a 5-letter alphabet, zipf-ish counts — both
    the full merge sequence and every final segmentation must match the
    independent reference exactly (this exercises tie-breaks, repeated
    letters, and merges that cascade into earlier merges)."""
    rng = random.Random(98)
    words = {}
    for _ in range(80):
        w = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 8)))
        words[w] = words.get(w, 0) + rng.randint(1, 20)
    ref_merges, ref_segs = _ref_bpe(words, 8)

    rows = [(i, " ".join([w] * c)) for i, (w, c) in enumerate(words.items())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["l"], r["r"], r["merged"], r["pair_cnt"])
           for r in train_bpe(df, n_merges=8).orderBy("it").collect()]
    assert got == ref_merges
    seg = {r["word"]: tuple(r["pieces"]) for r in bpe_segment(df, n_merges=8).collect()}
    assert seg == ref_segs


def test_tie_break_is_lexicographic(spark):
    """All four pairs of 'zb zb ya ya' tie at count 2 — the
    lexicographically smallest, (a, </w>), must win on both engines
    (the determinism the oracle needs)."""
    df = spark.createDataFrame(
        [(1, "zb zb ya ya")], "doc_id long, text string"
    )
    first = train_bpe(df, n_merges=1).collect()[0]
    assert (first["l"], first["r"], first["pair_cnt"]) == ("a", "</w>", 2)


def test_segmentation_reassembles_word(spark):
    """Invariant: concatenating a word's pieces always yields
    word + '</w>' no matter which merges fired."""
    df = spark.createDataFrame(
        [(1, "abab abab baba bb aa abba")], "doc_id long, text string"
    )
    out = bpe_segment(df, n_merges=5)
    bad = out.filter(
        F.concat_ws("", "pieces") != F.concat(F.col("word"), F.lit("</w>"))
    ).count()
    assert bad == 0


def test_plan_one_row_broadcast_per_iteration(spark):
    """The per-iteration argmax attach is a one-row broadcast — pin
    BroadcastNestedLoopJoin (fine for a 1-row side) and forbid
    CartesianProduct; the corpus is only scanned by word_counts."""
    df = spark.createDataFrame([(1, "aa ab aa")], "doc_id long, text string")
    plan = train_bpe(df, n_merges=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

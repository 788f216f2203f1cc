"""Pins for exact substring deduplication (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better",
re-expressed as k-gram doc-frequency + a per-doc gaps-and-islands HOF
fold — no suffix array, no window function). DuckDB equivalence is in
test_oracle.py; these pin the span semantics on engineered corpora."""

from pyspark.sql import functions as F

from auth2wd_spark.mlops.dedup import duplicate_spans, strip_duplicate_spans

K = 8


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shared(n, tag="s"):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_maximal_span_boundaries(spark):
    """A 12-token shared run with k=8 must come back as ONE maximal
    12-token span at the exact offsets — not 5 overlapping 8-grams."""
    sh = _shared(12)
    d = _docs(spark, [(1, "a b c " + sh + " x y z"), (2, sh + " q r")])
    spans = {r["doc_id"]: r for r in duplicate_spans(d, k=K).collect()}
    assert (spans[1]["span_start"], spans[1]["span_end"], spans[1]["span_tokens"]) == (3, 14, 12)
    assert (spans[2]["span_start"], spans[2]["span_end"], spans[2]["span_tokens"]) == (0, 11, 12)


def test_disjoint_spans_stay_separate_islands(spark):
    """Two shared runs separated by enough unique tokens are two spans;
    the gap rule (next anchor > prev + k) is the discriminator."""
    a, b = _shared(9, "a"), _shared(9, "b")
    gap = " ".join(f"u{i}" for i in range(10))
    d = _docs(spark, [(1, a + " " + gap + " " + b), (2, a + " z " + b)])
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_spans(d, k=K).filter(F.col("doc_id") == 1).collect()
    )
    assert got == [(0, 8), (19, 27)]


def test_within_doc_repeats_do_not_mark(spark):
    """min_docs=2 counts DISTINCT documents: a doc repeating its own
    phrase is not cross-document duplication."""
    rep = " ".join(["rep"] * 20)
    d = _docs(spark, [(1, rep), (2, "totally different tokens here every one unique now")])
    assert duplicate_spans(d, k=K).count() == 0


def test_short_docs_absent(spark):
    d = _docs(spark, [(1, "only three tokens"), (2, "only three tokens")])
    # 3 tokens < k=8: no grams, no spans — even though the texts are equal
    assert duplicate_spans(d, k=K).count() == 0


def test_strip_removes_exactly_the_spans(spark):
    sh = _shared(12)
    d = _docs(
        spark,
        [(1, "a b c " + sh + " x y z"), (2, sh + " q r"), (3, "u v w only")],
    )
    out = {r["doc_id"]: r["text"] for r in strip_duplicate_spans(d, k=K).collect()}
    assert out[1] == "a b c x y z"
    assert out[2] == "q r"
    assert out[3] == "u v w only"  # untouched docs stream through


def test_strip_fully_covered_doc_becomes_empty(spark):
    sh = _shared(10)
    d = _docs(spark, [(1, sh), (2, sh)])
    out = {r["doc_id"]: r["text"] for r in strip_duplicate_spans(d, k=K).collect()}
    assert out == {1: "", 2: ""}


def test_strip_preserves_schema_and_rowcount(spark):
    d = _docs(spark, [(i, f"doc {i} " + _shared(12)) for i in range(6)])
    out = strip_duplicate_spans(d, k=K)
    assert out.columns == ["doc_id", "text"]
    assert out.count() == 6


def test_plan_has_no_window_and_no_cartesian(spark):
    """The span merge is a HOF fold inside one doc-keyed agg — pin that
    neither a Window operator nor a Cartesian/BNL join sneaks in."""
    d = _docs(spark, [(1, _shared(12)), (2, _shared(12))])
    plan = duplicate_spans(d, k=K)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_random_corpus_matches_python_reference(spark):
    """30 random docs over a 4-token vocabulary (collisions guaranteed)
    vs an independent brute-force reference: gram doc-frequency, marked
    positions, island merge all recomputed in plain Python."""
    import random

    rng = random.Random(4105)
    vocab = [f"v{i}" for i in range(4)]  # 4^4=256 possible grams over ~1500 positions
    texts = {d: [rng.choice(vocab) for _ in range(rng.randint(3, 60))] for d in range(30)}
    k = 4

    gram_docs = {}
    for d, toks in texts.items():
        for i in range(len(toks) - k + 1):
            gram_docs.setdefault(tuple(toks[i : i + k]), set()).add(d)
    expected = set()
    for d, toks in texts.items():
        marked = [
            i
            for i in range(len(toks) - k + 1)
            if len(gram_docs[tuple(toks[i : i + k])]) >= 2
        ]
        islands, last = [], None
        for p in marked:
            if last is not None and p <= last[1] + k:
                last[1] = p
            else:
                last = [p, p]
                islands.append(last)
        for s, e in islands:
            expected.add((d, s, e + k - 1, e + k - s))

    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in texts.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(df, k=k).collect()
    }
    assert got == expected and len(expected) > 10

"""Pins for BM25 retrieval (mlops/retrieval.py). DuckDB equivalence is
in test_oracle.py; these pin the ranking semantics and the
exact-integer determinism contract."""

import math

from auth2wd_spark.mlops.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_score(term_tfs, dl, n_docs, total_tokens, dfs, k1=1.2, b=0.75):
    """Independent replay of the scoring formula."""
    s = 0
    for t, tf in term_tfs.items():
        idf_micro = round(
            math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5)) * 1e6
        )
        norm = k1 * ((1.0 - b) + b * (dl * n_docs) / total_tokens)
        s += round(idf_micro * (tf * (k1 + 1.0)) / (tf + norm))
    return s


def test_golden_scores(spark):
    rows = [
        (1, "cat dog cat fish"),     # cat×2 dog×1
        (2, "cat bird bird bird"),   # cat×1
        (3, "fish fish fish fish"),  # no query terms
        (4, "dog dog dog dog"),      # dog×4
    ]
    d = _docs(spark, rows)
    got = {r["doc_id"]: (r["score_micro"], r["n_hit_terms"])
           for r in bm25_topk(d, ["cat", "dog"], topk=10).collect()}
    n, t = 4, 16
    dfs = {"cat": 2, "dog": 2}
    assert got[1] == (_py_score({"cat": 2, "dog": 1}, 4, n, t, dfs), 2)
    assert got[2] == (_py_score({"cat": 1}, 4, n, t, dfs), 1)
    assert got[4] == (_py_score({"dog": 4}, 4, n, t, dfs), 1)
    assert 3 not in got  # no query term, absent


def test_more_hits_rank_higher(spark):
    d = _docs(
        spark,
        [(1, "q q q x"), (2, "q q x x"), (3, "q x x x"), (4, "x x x x")],
    )
    ranked = [r["doc_id"] for r in bm25_topk(d, ["q"], topk=10).collect()]
    assert ranked == [1, 2, 3]


def test_length_normalization(spark):
    """Same tf, longer doc → lower score (the b·dl/avgdl term)."""
    d = _docs(
        spark,
        [(1, "q a"), (2, "q a a a a a a a a a a a a a a a")],
    )
    got = {r["doc_id"]: r["score_micro"] for r in bm25_topk(d, ["q"], topk=10).collect()}
    assert got[1] > got[2]


def test_topk_bound_and_tiebreak(spark):
    """20 identical docs: all tie, top-5 must be doc_ids 0..4 (total
    order = score desc, id asc — the engine-independence contract)."""
    d = _docs(spark, [(i, "q a b") for i in range(20)])
    out = [r["doc_id"] for r in bm25_topk(d, ["q"], topk=5).collect()]
    assert out == [0, 1, 2, 3, 4]


def test_empty_query_rejected(spark):
    import pytest

    d = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        bm25_topk(d, [])


def test_plan_idf_broadcast_no_cartesian(spark):
    d = _docs(spark, [(1, "q a"), (2, "q b")])
    plan = bm25_topk(d, ["q", "a"], topk=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the tf×idf attach

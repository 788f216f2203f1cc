"""Pins for mlops/pq.py: codebook/code shapes, exact-recovery golden case,
ADC physical plan (broadcast table, no Cartesian)."""

import pytest
from pyspark.sql import functions as F

from auth2wd_spark.mlops.pq import (
    ivfpq_adc_topk,
    pq_adc_topk,
    pq_encode,
    subspace_split,
    train_ivfpq,
    train_pq_codebooks,
)


@pytest.fixture(scope="module")
def vecs(spark):
    # 8 vectors, dim 8: two tight groups per subspace half so k=2 k-means
    # converges to the group means in one iteration
    rows = []
    for i in range(8):
        base = 10.0 if i % 2 == 0 else -10.0
        rows.append((i, [base + 0.5 * (i % 2)] * 4 + [-base] * 4))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_subspace_split_shapes(spark, vecs):
    sub = subspace_split(vecs, m=2, dim=8)
    assert sub.count() == 16
    sizes = sub.select(F.size("sub_emb").alias("s")).distinct().collect()
    assert [r["s"] for r in sizes] == [4]


def test_codebook_and_code_shapes(spark, vecs):
    cb = train_pq_codebooks(vecs, m=2, k=2, dim=8, n_iter=1)
    assert cb.count() == 4  # m × k
    codes = pq_encode(vecs, cb, m=2, dim=8)
    got = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert len(got) == 8
    assert all(len(c) == 2 for c in got.values())
    # the two parity groups must land in distinct codes per subspace
    assert got[0] != got[1]
    assert got[0] == got[2] == got[4] == got[6]
    assert got[1] == got[3] == got[5] == got[7]


def test_adc_identical_vector_is_nearest(spark):
    # duplicate pairs: ADC distance between a vector and its duplicate is
    # exactly 0 (same codes), so the duplicate must rank first
    rows = [(i, [float(i // 2 * 7 + d) for d in range(8)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = train_pq_codebooks(df, m=2, k=3, dim=8, n_iter=2)
    codes = pq_encode(df, cb, m=2, dim=8)
    q = df.filter(F.col("vec_id") == 0)
    top = pq_adc_topk(q, cb, codes, m=2, dim=8, k_neighbors=1).collect()
    assert top[0]["neighbor_id"] == 1  # vec 1 is vec 0's duplicate
    assert top[0]["approx_d2"] == 0.0


def test_training_iteration_plan_no_rejoin(spark, vecs):
    # one Lloyd iteration = broadcast assignment (sub_emb carried through
    # the argmin agg) + the quantized-mean agg: NO sort-merge/shuffled-hash
    # join may appear (the old shape re-joined the full subspace table per
    # iteration to fetch sub_emb back), and the only join is the broadcast
    # centroid join
    from auth2wd_spark.mlops.pq import _iteration_means

    sub = subspace_split(vecs, m=2, dim=8)
    cents = subspace_split(vecs.orderBy("vec_id").limit(2), m=2, dim=8).select(
        "sub_id", F.col("vec_id").alias("centroid_id"), F.col("sub_emb").alias("embedding")
    )
    plan = (
        _iteration_means(sub, cents, 1_000_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1


def _ivfpq_corpus(spark):
    # three well-separated groups of duplicates → coarse lists split them;
    # vec 0's duplicate is vec 1
    rows = [(i, [float(i // 2 * 50 + d) for d in range(8)]) for i in range(12)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivfpq_duplicate_is_rank1_at_min_adc_distance(spark):
    df = _ivfpq_corpus(spark)
    coarse, lists, codebooks, codes = train_ivfpq(df, n_lists=3, m=2, k=2, dim=8, n_iter=2)
    q = df.filter(F.col("vec_id") == 0)
    top = ivfpq_adc_topk(q, coarse, codebooks, codes, m=2, dim=8, n_probe=1, k_neighbors=1).collect()
    # vec 1 is the exact duplicate: same list, same residual → same codes,
    # so its ADC distance is the MINIMUM the table can produce for this
    # query (q's codes are argmin by construction). ADC measures distance
    # to the code CENTROID, not to the neighbor, so it is nonzero whenever
    # k is too small to represent the residual exactly — replay the table
    # by hand and pin the exact value.
    assert top[0]["neighbor_id"] == 1
    list_of = {r["vec_id"]: r["list_id"] for r in lists.collect()}
    c_emb = {
        r["centroid_id"]: list(r["embedding"]) for r in coarse.collect()
    }[list_of[0]]
    q_emb = [float(d) for d in range(8)]  # vec 0
    q_res = [a - b for a, b in zip(q_emb, c_emb)]
    cb = {}
    for r in codebooks.collect():
        cb.setdefault(r["sub_id"], []).append(list(r["embedding"]))
    expect = 0.0
    for s in (0, 1):
        sub = q_res[s * 4 : s * 4 + 4]
        expect += min(
            round(sum((a - b) ** 2 for a, b in zip(sub, cent)), 6) for cent in cb[s]
        )
    assert top[0]["approx_d2"] == round(expect, 6)


def test_ivfpq_scores_only_probed_lists(spark):
    df = _ivfpq_corpus(spark)
    coarse, lists, codebooks, codes = train_ivfpq(df, n_lists=3, m=2, k=2, dim=8, n_iter=2)
    q = df.filter(F.col("vec_id") == 0)
    out = ivfpq_adc_topk(q, coarse, codebooks, codes, m=2, dim=8, n_probe=1, k_neighbors=100)
    scored_ids = {r["neighbor_id"] for r in out.collect()}
    list_of = {r["vec_id"]: r["list_id"] for r in lists.collect()}
    probed = {list_of[0]}  # n_probe=1 → only the query's own list
    assert scored_ids  # non-empty
    assert all(list_of[n] in probed for n in scored_ids)
    # and something was genuinely excluded (3 separated groups, 1 probed)
    assert len(scored_ids) < 11


def test_ivfpq_plan_no_cartesian(spark):
    df = _ivfpq_corpus(spark)
    coarse, _lists, codebooks, codes = train_ivfpq(df, n_lists=3, m=2, k=2, dim=8, n_iter=1)
    q = df.filter(F.col("vec_id") == 0)
    plan = (
        ivfpq_adc_topk(q, coarse, codebooks, codes, m=2, dim=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivfpq_rerank_lifts_recall_over_raw_adc(spark):
    """Quality-discriminative pin: on the driver embeddings (a weak-margin
    corpus — median top1→top10 L2 gap ≈ 20% of d1, so quantized distances
    alone cannot rank), the exact re-rank stage must (a) clear an absolute
    recall@1 floor and (b) strictly beat raw ADC recall@1. Measured at
    pin time: rerank 14/20 vs ADC 4/20 (probe 2/8, shortlist 100)."""
    import os

    import numpy as np

    from auth2wd_spark.mlops.pq import ivfpq_rerank_topk, train_ivfpq

    sf_dir = os.environ.get("AUTH2WD_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"driver testdata not available: {sf_dir}")
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = e.collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    qids = list(range(0, 100, 5))
    true1 = {}
    for qid in qids:
        d = {v: float(((V[qid] - vec) ** 2).sum()) for v, vec in V.items() if v != qid}
        true1[qid] = min(d, key=lambda v: (d[v], v))
    q = e.filter(F.col("vec_id").isin(qids))
    coarse, _lists, codebooks, codes = train_ivfpq(e, n_lists=8, m=4, k=8, dim=64, n_iter=2)
    rr = ivfpq_rerank_topk(
        q, e, coarse, codebooks, codes, m=4, dim=64, n_probe=2, shortlist=100, k_neighbors=1
    )
    rr1 = {r["query_id"]: r["neighbor_id"] for r in rr.collect()}
    adc = ivfpq_adc_topk(q, coarse, codebooks, codes, m=4, dim=64, n_probe=2, k_neighbors=1)
    adc1 = {r["query_id"]: r["neighbor_id"] for r in adc.collect()}
    recall_rr = sum(1 for qid in qids if rr1.get(qid) == true1[qid])
    recall_adc = sum(1 for qid in qids if adc1.get(qid) == true1[qid])
    assert recall_rr >= 11, (recall_rr, recall_adc)  # measured 14, margin for corpus drift
    assert recall_rr > recall_adc, (recall_rr, recall_adc)


def test_adc_plan_broadcasts_table_no_cartesian(spark, vecs):
    cb = train_pq_codebooks(vecs, m=2, k=2, dim=8, n_iter=1)
    codes = pq_encode(vecs, cb, m=2, dim=8)
    q = vecs.filter(F.col("vec_id") == 0)
    plan = (
        pq_adc_topk(q, cb, codes, m=2, dim=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan

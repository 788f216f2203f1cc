"""Pins for mlops/pq.py: codebook/code shapes, exact-recovery golden case,
ADC physical plan (broadcast table, no Cartesian)."""

import pytest
from pyspark.sql import functions as F

from auth2wd_spark.mlops.pq import (
    pq_adc_topk,
    pq_encode,
    subspace_split,
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

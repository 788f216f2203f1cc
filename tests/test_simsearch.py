"""Multi-band SRP-LSH ANN: recall vs the exact brute-force baseline, and
the bucket-width cap. Queries are deterministic noisy copies of corpus
vectors (v_i + 0.05·v_{i+100}, cosine ≈ 0.9975 to the source), so the true
top-1 neighbor is known and no RNG is involved."""

import os

import pytest
from pyspark.sql import functions as F

from auth2wd_spark.mlops.simsearch import brute_force_topk, lsh_ann_topk, srp_lsh_buckets

SF_DIR = os.environ.get("AUTH2WD_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def corpus(spark):
    path = os.path.join(SF_DIR, "embeddings.parquet")
    if not os.path.isfile(path) and not os.path.isdir(path):
        pytest.skip(f"driver testdata not available: {path}")
    return spark.read.parquet(path).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


@pytest.fixture(scope="module")
def noisy_queries(corpus):
    noise = corpus.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("nemb"))
    return (
        corpus.filter(F.col("vec_id") < 50)
        .join(noise, noise["nid"] == F.col("vec_id") + 100)
        .select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.zip_with("embedding", "nemb", lambda a, b: a + b * 0.05).alias("embedding"),
        )
    )


def test_lsh_recall_vs_brute_force(spark, corpus, noisy_queries):
    """recall@1 ≥ 0.9 for near-dup queries (expected ~0.99 at 16 planes ×
    4 bands for cosine ≈ 0.9975: collision p = 1-(1-(1-θ/π)^16)^4)."""
    bf = {
        r["query_id"]: r["neighbor_id"]
        for r in brute_force_topk(noisy_queries, corpus, k=1).collect()
    }
    lsh = {
        r["query_id"]: r["neighbor_id"]
        for r in lsh_ann_topk(noisy_queries, corpus, k=1, n_planes=16, n_bands=4).collect()
    }
    assert len(bf) == 50
    # sanity: the exact top-1 of a planted query is its source vector
    hits_true = sum(1 for q, n in bf.items() if n == q - 1000000)
    assert hits_true == 50
    recall = sum(1 for q, n in bf.items() if lsh.get(q) == n) / len(bf)
    assert recall >= 0.9, f"recall@1 {recall}"


def test_lsh_candidates_bounded(spark, corpus, noisy_queries):
    """The band join must examine FAR fewer pairs than brute force — the
    whole point of sharper 16-bit buckets."""
    qb = srp_lsh_buckets(noisy_queries, 16, 4).withColumnRenamed("vec_id", "query_id")
    cb = srp_lsh_buckets(corpus, 16, 4).withColumnRenamed("vec_id", "neighbor_id")
    n_cand = (
        qb.join(cb, ["band", "bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
        .count()
    )
    n_brute = 50 * 500
    assert 0 < n_cand < n_brute * 0.2, f"candidates {n_cand} vs brute {n_brute}"


def test_bucket_width_cap_drops_boilerplate_cluster(spark, corpus, noisy_queries):
    """200 identical vectors land in one bucket per band; a width cap
    excludes them from the candidate side while normal near-dup candidates
    (noisy query → its source vector) survive in their narrow buckets."""
    one = corpus.filter(F.col("vec_id") == 0).select("embedding")
    clones = (
        spark.range(2000, 2200)
        .withColumnRenamed("id", "vec_id")
        .crossJoin(one)
    )
    poly = corpus.unionByName(clones)
    capped = lsh_ann_topk(noisy_queries, poly, k=1, max_bucket_width=50)
    got = {r["neighbor_id"] for r in capped.collect()}
    assert not any(2000 <= n < 2200 for n in got)  # cluster excluded
    # near-dup sources (narrow buckets) still found for most queries
    assert len([n for n in got if n < 500]) >= 40


def test_ivf_recall_vs_brute_force(spark, corpus, noisy_queries):
    """IVF (16 lists, probe 2): a near-dup query lands in its source
    vector's list almost surely (noise moves the centroid argmax only when
    two centroids are near-tied, and probe-2 covers the runner-up)."""
    from auth2wd_spark.mlops.simsearch import ivf_ann_topk

    bf = {
        r["query_id"]: r["neighbor_id"]
        for r in brute_force_topk(noisy_queries, corpus, k=1).collect()
    }
    ivf = {
        r["query_id"]: r["neighbor_id"]
        for r in ivf_ann_topk(noisy_queries, corpus, n_centroids=16, n_probe=2, k=1).collect()
    }
    recall = sum(1 for q, n in bf.items() if ivf.get(q) == n) / len(bf)
    assert recall >= 0.9, f"IVF recall@1 {recall}"


def test_ivf_candidates_bounded(spark, corpus, noisy_queries):
    """Probing 2 of 16 inverted lists must rank a small fraction of the
    corpus — the inverted-file scale property (≈ n_probe/n_centroids of
    the corpus per query, ±list-size imbalance)."""
    from auth2wd_spark.mlops.simsearch import ivf_assign

    n_corpus = corpus.count()
    n_queries = noisy_queries.count()
    centroids = (
        corpus.orderBy("vec_id").limit(16)
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    )
    lists = ivf_assign(corpus, centroids, n_probe=1).withColumnRenamed("vec_id", "neighbor_id")
    probes = ivf_assign(noisy_queries, centroids, n_probe=2).withColumnRenamed(
        "vec_id", "query_id"
    )
    n_cand = probes.join(lists, "centroid_id").count()
    brute_pairs = n_corpus * n_queries
    assert n_cand < brute_pairs * 0.5, f"{n_cand} candidates vs {brute_pairs} brute pairs"


# -- trained k-means centroids (round-4) -------------------------------------

def _clustered_corpus(spark, n_clusters=8, per_cluster=40, dims=16):
    """Deterministic clustered corpus where the first-16-by-vec_id init is
    PATHOLOGICAL: vec_ids are ordered cluster-major, so all 16 stand-in
    centroids come from clusters 0-1 and probing can miss the rest."""
    rows = []
    for vid in range(n_clusters * per_cluster):
        c = vid // per_cluster
        emb = []
        for d in range(dims):
            v = 1.0 if d == c else 0.0
            # deterministic within-cluster spread, no RNG
            v += 0.08 * (((vid * 31 + d * 7) % 11) - 5) / 5.0
            emb.append(float(v))
        rows.append((vid, emb))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_kmeans_centroids_deterministic(spark):
    """Two independent trainings produce bit-identical centroids — the
    exact-integer-sum mean update has no partial-agg order sensitivity."""
    from auth2wd_spark.mlops.simsearch import train_centroids_kmeans

    corpus = _clustered_corpus(spark)
    a = train_centroids_kmeans(corpus, n_centroids=16, n_iter=2)
    b = train_centroids_kmeans(corpus.repartition(7), n_centroids=16, n_iter=2)
    ra = {r["centroid_id"]: r["embedding"] for r in a.collect()}
    rb = {r["centroid_id"]: r["embedding"] for r in b.collect()}
    assert ra == rb


def test_kmeans_trained_beats_standin(spark):
    """Verdict r3 ask #4: on a clustered corpus whose first-16 vectors
    cover only 2 of 8 clusters, trained centroids must (a) give recall@1 ≥
    the first-16 stand-in and (b) genuinely improve INDEX QUALITY — the
    spherical-k-means objective (mean cosine of each vector to its
    assigned centroid). (a) alone can be vacuous: near-dup queries
    co-assign with their source under ANY centroid set (same argmax over
    the same table), so recall stays high even for degenerate centroids —
    the objective is what separates trained from stand-in (measured 0.98
    vs 0.19 here)."""
    from auth2wd_spark.mlops.simsearch import (
        _cos,
        ivf_ann_topk,
        ivf_assign,
        train_centroids_kmeans,
    )

    corpus = _clustered_corpus(spark)
    # one directionally-noisy query per cluster; true top-1 = source vector
    src = corpus.filter(F.col("vec_id") % 40 == 3).select(
        F.col("vec_id").alias("sid"), F.col("embedding").alias("semb")
    )
    oth = corpus.select(F.col("vec_id").alias("oid"), F.col("embedding").alias("oemb"))
    queries = src.join(oth, F.col("oid") == (F.col("sid") + 160) % 320).select(
        (F.col("sid") + 1000000).alias("vec_id"),
        F.zip_with("semb", "oemb", lambda a, b: a + b * 0.12).alias("embedding"),
    )
    bf = {
        r["query_id"]: r["neighbor_id"]
        for r in brute_force_topk(queries, corpus, k=1).collect()
    }
    assert sum(1 for q, n in bf.items() if n == q - 1000000) == 8  # sanity

    standin = (
        corpus.orderBy("vec_id").limit(16)
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    )
    trained = train_centroids_kmeans(corpus, n_centroids=16, n_iter=3)

    def recall(cents):
        got = {
            r["query_id"]: r["neighbor_id"]
            for r in ivf_ann_topk(
                queries, corpus, n_centroids=16, n_probe=2, k=1, centroids=cents
            ).collect()
        }
        return sum(1 for q, n in bf.items() if got.get(q) == n) / len(bf)

    def objective(cents):
        a = ivf_assign(corpus, cents, n_probe=1)
        j = a.join(corpus, "vec_id").join(
            cents.select("centroid_id", F.col("embedding").alias("c_emb")),
            "centroid_id",
        )
        return j.select(
            F.avg(_cos(F.col("embedding"), F.col("c_emb"))).alias("o")
        ).collect()[0]["o"]

    r_standin, r_trained = recall(standin), recall(trained)
    assert r_trained >= r_standin, f"trained {r_trained} < standin {r_standin}"
    assert r_trained >= 0.9, f"trained recall@1 {r_trained}"
    o_standin, o_trained = objective(standin), objective(trained)
    assert o_trained > o_standin + 0.3, (
        f"training did not improve the index: {o_trained} vs {o_standin}"
    )


def test_semantic_dedup_drops_planted_copies(spark, corpus):
    """SemDeDup keep contract: a scaled copy (cosine 1.0 to its source)
    lands in the same cluster (cosine assignment is scale-invariant) and
    is dropped as the higher id; its source and every unplanted vector
    survive."""
    from auth2wd_spark.mlops.dedup import semantic_dedup

    planted = corpus.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    out = semantic_dedup(
        corpus.union(planted), n_centroids=4, n_iter=1, threshold=0.99
    )
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == corpus.count() + 10  # one row per input vector
    for i in range(10):
        assert rows[i]["keep"] == 1
        assert rows[i + 1000000]["keep"] == 0
        # scale-invariant assignment: copy shares the source's cluster
        assert rows[i + 1000000]["centroid_id"] == rows[i]["centroid_id"]
    # the random corpus has no natural >=0.99 pairs: everything else kept
    assert sum(1 for r in rows.values() if r["keep"] == 0) == 10


def test_semantic_dedup_all_kept_without_dups(spark, corpus):
    from auth2wd_spark.mlops.dedup import semantic_dedup

    out = semantic_dedup(corpus, n_centroids=4, n_iter=1, threshold=0.99)
    assert out.filter(F.col("keep") == 0).count() == 0

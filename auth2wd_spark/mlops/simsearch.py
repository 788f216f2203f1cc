"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (JVM-side zip_with/aggregate,
double precision); sign-random-projection LSH bucketing is the scale path —
planes are derived from deterministic per-dimension hashes so results are
reproducible without any RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k: broadcast the query side, deterministic
    tie-break on neighbor id."""
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (
        _norm(F.col("q_emb")) * _norm(F.col("c_emb"))
    )
    ranked = pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").alias("rank"))
    )


def srp_lsh_buckets(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Sign-random-projection bucket per vector.

    Plane p's component for dimension d is a deterministic pseudo-random
    value in [-1, 1): (xxhash64(d, p) % 10^6)/5·10^5 − 1 — reproducible
    across runs and engines without shipping a plane matrix.
    """
    dims = F.expr("transform(embedding, (x, i) -> struct(x as x, i as i))")

    def plane_proj(p: int):
        def step(acc, s):
            weight = (
                F.pmod(F.xxhash64(s["i"].cast("long"), F.lit(p)), F.lit(1000000)).cast("double")
                / 500000.0
            ) - 1.0
            return acc + s["x"].cast("double") * weight

        return F.aggregate(dims, F.lit(0.0), step)

    proj = [plane_proj(p) for p in range(n_planes)]
    bucket = None
    for p in range(n_planes):
        bit = F.when(proj[p] > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket.bitwiseXOR(term)
    return embeddings.select("vec_id", bucket.alias("bucket"))


def lsh_ann_topk(queries: DataFrame, corpus: DataFrame, k: int = 10, n_planes: int = 8) -> DataFrame:
    """ANN: restrict the cosine ranking to same-bucket candidates."""
    qb = srp_lsh_buckets(queries, n_planes).withColumnRenamed("vec_id", "query_id")
    cb = srp_lsh_buckets(corpus, n_planes).withColumnRenamed("vec_id", "neighbor_id")
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")).join(qb, "query_id")
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")).join(cb, "neighbor_id")
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))
    ranked = pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").alias("rank"))
    )

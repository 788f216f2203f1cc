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


def _cos(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k: broadcast the query side, deterministic
    tie-break on neighbor id."""
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    ranked = pairs.select(
        "query_id", "neighbor_id", _cos(F.col("q_emb"), F.col("c_emb")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").alias("rank"))
    )


def srp_lsh_buckets(
    embeddings: DataFrame, n_planes: int = 16, n_bands: int = 4, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Multi-band sign-random-projection: (vec_id, band, bucket) rows.

    Each band uses a DISJOINT set of `n_planes` hyperplanes (plane index
    offset by band·n_planes); plane p's component for dimension d is a
    deterministic pseudo-random value in [-1, 1):
    (xxhash64(d, p) % 10^6)/5·10^5 − 1 — reproducible across runs without
    shipping a plane matrix.

    Scale shape: candidates join per (band, bucket). With 16 planes a band
    has 2^16 buckets, so bucket width is ~N/65536 (vs N/256 for the old
    single-band 8-plane scheme, whose within-bucket quadratic join was the
    100 TB killer); the independent bands recover the recall that the
    sharper buckets alone would lose — a pair at angle θ collides in ≥1 of
    b bands with p = 1 − (1 − (1 − θ/π)^planes)^b.
    """
    dims = F.expr("transform(embedding, (x, i) -> struct(x as x, i as i))")

    def plane_proj(p: int):
        def step(acc, s):
            if hash_fn == "xxhash64":
                hv = F.pmod(F.xxhash64(s["i"].cast("long"), F.lit(p)), F.lit(1000000))
            else:  # portable md5 variant — reproducible in DuckDB (oracle)
                seeded = F.concat(s["i"].cast("string"), F.lit("\x1f"), F.lit(str(p)))
                hv = F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long") % 1000000
            weight = (hv.cast("double") / 500000.0) - 1.0
            return acc + s["x"].cast("double") * weight

        return F.aggregate(dims, F.lit(0.0), step)

    band_structs = []
    for b in range(n_bands):
        bucket = None
        for j in range(n_planes):
            proj = plane_proj(b * n_planes + j)
            bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            term = F.shiftleft(bit, j)
            bucket = term if bucket is None else bucket.bitwiseXOR(term)
        band_structs.append(
            F.struct(F.lit(b).cast("int").alias("band"), bucket.alias("bucket"))
        )
    return embeddings.select(
        "vec_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("vec_id", "bb.band", "bb.bucket")


# The IVF path quantizes every cosine to this many decimals BEFORE any
# ORDER BY / argmax (Spark AND the DuckDB oracle): the two engines compute
# the cosine with different floating-point expression trees (fold vs
# list_cosine_similarity), so a raw-double comparison could flip a
# near-tie argmax in one engine only (ADVICE r4). At 6 decimals a flip
# needs the true value within the engines' fp disagreement (~1e-14) of a
# 5e-7 grid boundary — ~1e-8 per comparison instead of "any near-tie".
# Ties the rounding creates resolve identically on both sides (id asc).
IVF_COS_DECIMALS = 6


def ivf_assign(vectors: DataFrame, centroids: DataFrame, n_probe: int = 1) -> DataFrame:
    """(vec_id, centroid_id): each vector's `n_probe` nearest centroids by
    cosine (deterministic tie-break on centroid_id asc; centroid_id must
    be numeric — it is a vec_id everywhere this module builds centroids).

    The centroid table is tiny by construction (hundreds to thousands of
    rows even for billion-vector corpora) → broadcast. The n_probe=1
    argmax (the hot shape: every training assign + the inverted lists) is
    a `max_by` hash aggregation — partial aggregation reduces the
    vec_id×centroid pairs map-side, so the shuffle carries one row per
    vector instead of n_centroids rows per vector (the window variant
    shuffled all 16N pair rows). n_probe>1 keeps the window top-k; every
    key group has exactly n_centroids rows — no skew possible.
    """
    c = centroids.select(F.col("centroid_id"), F.col("embedding").alias("c_emb"))
    pairs = vectors.select("vec_id", "embedding").crossJoin(F.broadcast(c))
    scored = pairs.select(
        "vec_id",
        "centroid_id",
        F.round(_cos(F.col("embedding"), F.col("c_emb")), IVF_COS_DECIMALS).alias("cos"),
    )
    if n_probe == 1:
        # max over (cos, -id): highest cosine wins, lowest id breaks ties
        return scored.groupBy("vec_id").agg(
            F.max_by(
                "centroid_id", F.struct(F.col("cos"), (-F.col("centroid_id")).alias("nid"))
            ).alias("centroid_id")
        )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select("vec_id", "centroid_id")
    )


def train_centroids_kmeans(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 2,
    quant: int = 1_000_000,
) -> DataFrame:
    """Deterministic spherical k-means (Lloyd's) as pure DataFrame ops —
    the round-3 "first-16 stand-in" made real.

    Init = first `n_centroids` vectors by vec_id (deterministic, same as
    the stand-in). Each iteration assigns every vector to its nearest
    centroid by cosine (ivf_assign — broadcast centroid table, fixed-size
    window groups) and replaces each centroid with its members'
    element-wise mean; empty clusters keep their previous centroid.

    Cross-engine determinism (the oracle replays training in DuckDB): the
    mean is an exact BIGINT sum of round(x·quant) divided in double by
    count·quant. Integer sums are associative-order independent, so
    Spark's partial aggregation and DuckDB's serial scan produce the SAME
    centroid bits; a raw double sum would differ in the last ulps and
    could flip a nearest-centroid argmax. Cosine assignment is
    scale-invariant, so the un-normalized mean is a valid spherical-k-means
    update. Driver state is the loop counter only — no .collect().

    Scale: each iteration is one broadcast join + one (centroid, dim)
    groupBy over n_rows·dim exploded values — shuffle-light (the agg is
    map-side combinable, output is n_centroids·dim rows). localCheckpoint
    on the (tiny) centroid table truncates the per-iteration lineage.
    """
    cents = (
        corpus.orderBy("vec_id")
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )
    for _ in range(n_iter):
        means = _centroid_means(corpus, cents, quant)
        new = (
            means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("centroid_id", F.expr("transform(pm, s -> s.m)").alias("new_emb"))
        )
        cents = (
            cents.join(new, "centroid_id", "left")
            .select(
                "centroid_id", F.coalesce("new_emb", "embedding").alias("embedding")
            )
            .localCheckpoint()
        )
    return cents


def _centroid_means(corpus: DataFrame, cents: DataFrame, quant: int) -> DataFrame:
    """One Lloyd's update's (centroid_id, pos, m) means — split out so the
    plan-shape test pins the REAL aggregation, not a replica."""
    assigned = ivf_assign(corpus, cents, n_probe=1)
    member = corpus.join(assigned, "vec_id").select(
        "centroid_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    return member.groupBy("centroid_id", "pos").agg(
        (
            F.sum(F.round(F.col("x") * quant).cast("long")).cast("double")
            / (F.count(F.lit(1)) * F.lit(float(quant)))
        ).alias("m")
    )


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 2,
    k: int = 10,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed ANN: the inverted-file scale path alongside SRP-LSH.

    Corpus vectors are assigned to their single nearest centroid (the
    inverted lists — at production scale these ARE the table's partitions/
    buckets, so a probe reads only the matching partitions); queries probe
    their `n_probe` nearest centroids and rank exact cosine within those
    lists only. Candidate volume ≈ n_probe/n_centroids of the corpus
    instead of all of it.

    `centroids` defaults to the first `n_centroids` corpus vectors by
    vec_id — a deterministic stand-in for offline k-means training (the
    index/search structure is identical; swap trained centroids in at
    production). Deterministic end-to-end, so DuckDB can replay it.
    """
    if centroids is None:
        centroids = (
            corpus.orderBy("vec_id")
            .limit(n_centroids)
            .select(F.col("vec_id").alias("centroid_id"), "embedding")
        )
    lists = ivf_assign(corpus, centroids, n_probe=1).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    probes = ivf_assign(queries, centroids, n_probe=n_probe).withColumnRenamed(
        "vec_id", "query_id"
    )
    cand = (
        probes.join(lists, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    pairs = cand.join(q, "query_id").join(c, "neighbor_id")
    ranked = pairs.select(
        "query_id",
        "neighbor_id",
        # quantized like ivf_assign so the oracle's replayed ranking
        # cannot diverge on engine fp (see IVF_COS_DECIMALS)
        F.round(_cos(F.col("q_emb"), F.col("c_emb")), IVF_COS_DECIMALS).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").alias("rank"))
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    n_bands: int = 4,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """ANN: cosine ranking restricted to candidates sharing ≥1 band bucket.

    Candidate pairs are deduped across bands BEFORE the cosine math, so a
    pair colliding in several bands costs one distance computation.
    `max_bucket_width` drops corpus buckets wider than the cap (boilerplate
    clusters); the drop is a recall trade the caller opts into.
    """
    qb = srp_lsh_buckets(queries, n_planes, n_bands).withColumnRenamed("vec_id", "query_id")
    cb = srp_lsh_buckets(corpus, n_planes, n_bands).withColumnRenamed("vec_id", "neighbor_id")
    if max_bucket_width is not None:
        w_counts = cb.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("bw"))
        cb = cb.join(
            w_counts.filter(F.col("bw") <= max_bucket_width).drop("bw"),
            ["band", "bucket"],
        )
    cand = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    pairs = cand.join(q, "query_id").join(c, "neighbor_id")
    ranked = pairs.select(
        "query_id", "neighbor_id", _cos(F.col("q_emb"), F.col("c_emb")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").alias("rank"))
    )

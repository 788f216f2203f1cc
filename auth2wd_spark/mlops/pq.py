"""Product quantization (PQ) for embedding compression + ADC search.

The 100 TB memory story for ANN: a 64-dim float vector is 256 bytes; its
PQ code at m=4 subspaces is 4 small ints. Search never touches raw
vectors — asymmetric distance computation (ADC, Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011) precomputes one
tiny (m × k) partial-distance table per query and scores every code by
summing m table lookups.

Spark-first shape:
  - codebook training is a generalized Lloyd's keyed by (sub_id,
    centroid_id): per iteration, ONE broadcast join feeding two
    map-side-combinable aggregations (the nearest-centroid argmin,
    which carries sub_emb through so nothing re-joins to fetch it
    back, then the (sub_id, centroid_id, pos) mean) for ALL subspaces
    together — not m separate jobs;
  - encoding is the same broadcast-join argmin (codes shuffle once, as
    n_docs × m tiny rows reduced to n_docs code arrays);
  - ADC search joins exploded codes against the broadcast partial table
    and sums — no raw-vector access, no crossJoin.

Cross-engine determinism (the DuckDB oracle replays training, encoding,
and search): centroid means use the exact-BIGINT quantized-sum trick from
simsearch.train_centroids_kmeans (order-independent across partial vs
serial aggregation); every L2² distance is ROUNDed to PQ_DIST_DECIMALS
before an argmin/ORDER BY, with centroid_id / vec_id as the total-order
tie-break, so the two engines' differently-ordered fp sums cannot flip a
near-tie (the residual inside-rounding-window ulp assumption is the same
one ann_ivf_top1 documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PQ_DIST_DECIMALS = 6


def _l2sq(a, b):
    # (x-y)*(x-y), not pow(x-y, 2): Math.pow is only ~1-ulp accurate, and
    # the oracle's multiplication must produce the same bits pre-rounding
    def sq(x, y):
        d = x.cast("double") - y.cast("double")
        return d * d

    return F.aggregate(F.zip_with(a, b, sq), F.lit(0.0), lambda acc, v: acc + v)


def subspace_split(embeddings: DataFrame, m: int, dim: int) -> DataFrame:
    """(vec_id, sub_id, sub_emb): m contiguous slices of dim/m each."""
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    w = dim // m
    subs = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("sub_id"),
                F.slice(F.col("embedding"), s * w + 1, w).cast("array<double>").alias("sub_emb"),
            )
            for s in range(m)
        ]
    )
    return embeddings.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", "s.sub_id", "s.sub_emb"
    )


def _assign(sub: DataFrame, cents: DataFrame, keep_emb: bool = False) -> DataFrame:
    """Nearest centroid per (vec_id, sub_id) by rounded L2², min-id ties.

    keep_emb=True carries sub_emb through the aggregation (it is constant
    within each (vec_id, sub_id) group, so `first` is deterministic and
    stays a partial+final hash agg) — the training loop needs it and a
    re-join to fetch it back would shuffle the full n_docs × m subspace
    table once per Lloyd iteration."""
    c = cents.select("sub_id", "centroid_id", F.col("embedding").alias("c_emb"))
    scored = sub.join(F.broadcast(c), "sub_id").select(
        "vec_id",
        "sub_id",
        "centroid_id",
        *(["sub_emb"] if keep_emb else []),
        F.round(_l2sq(F.col("sub_emb"), F.col("c_emb")), PQ_DIST_DECIMALS).alias("d2"),
    )
    aggs = [F.min_by("centroid_id", F.struct("d2", "centroid_id")).alias("code")]
    if keep_emb:
        aggs.append(F.first("sub_emb").alias("sub_emb"))
    return scored.groupBy("vec_id", "sub_id").agg(*aggs)


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    n_iter: int = 2,
    quant: int = 1_000_000,
) -> DataFrame:
    """(sub_id, centroid_id, embedding): per-subspace L2 k-means, all
    subspaces trained in one keyed job per iteration.

    Init = the first k vectors by vec_id, sliced per subspace (the same
    deterministic seed rule as train_centroids_kmeans). Empty clusters
    keep their previous centroid. The centroid table is m × k rows —
    localCheckpoint per iteration truncates lineage at negligible cost.
    """
    sub = subspace_split(embeddings, m, dim)
    first_k = embeddings.orderBy("vec_id").limit(k)
    cents = subspace_split(first_k, m, dim).select(
        "sub_id", F.col("vec_id").alias("centroid_id"), F.col("sub_emb").alias("embedding")
    )
    for _ in range(n_iter):
        means = _iteration_means(sub, cents, quant)
        new = (
            means.groupBy("sub_id", "centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("pm"))
            .select(
                "sub_id",
                "centroid_id",
                F.expr("transform(pm, s -> s.mval)").alias("new_emb"),
            )
        )
        cents = (
            cents.join(new, ["sub_id", "centroid_id"], "left")
            .select(
                "sub_id",
                "centroid_id",
                F.coalesce("new_emb", "embedding").alias("embedding"),
            )
            .localCheckpoint()
        )
    return cents


def _iteration_means(sub: DataFrame, cents: DataFrame, quant: int) -> DataFrame:
    """One Lloyd iteration's (sub_id, centroid_id, pos, mval) quantized
    means — split out so the plan-shape test pins the REAL aggregation
    (broadcast assignment carrying sub_emb through, no re-join)."""
    members = _assign(sub, cents, keep_emb=True)
    return (
        members.select(
            "sub_id",
            F.col("code").alias("centroid_id"),
            F.posexplode("sub_emb").alias("pos", "val"),
        )
        .groupBy("sub_id", "centroid_id", "pos")
        .agg(
            (
                F.sum(F.round(F.col("val") * quant).cast("long")).cast("double")
                / (F.count(F.lit(1)) * F.lit(float(quant)))
            ).alias("mval")
        )
    )


def pq_encode(
    embeddings: DataFrame, codebooks: DataFrame, m: int = 4, dim: int = 64
) -> DataFrame:
    """(vec_id, codes): codes[s] = nearest centroid_id in subspace s."""
    sub = subspace_split(embeddings, m, dim)
    codes = _assign(sub, codebooks)
    return (
        codes.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub_id", "code"))).alias("sc"))
        .select("vec_id", F.expr("transform(sc, s -> s.code)").alias("codes"))
    )


def train_ivfpq(
    embeddings: DataFrame,
    n_lists: int = 8,
    n_probe: int = 2,  # noqa: ARG001 — kept in the signature as the search-time default
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    n_iter: int = 2,
    quant: int = 1_000_000,
) -> tuple:
    """IVF-PQ index (Jégou et al. 2011 §IV): returns (coarse, lists,
    codebooks, codes).

    - coarse: the PQ trainer at m=1 IS a plain L2 k-means over the full
      vector — one code path, no duplicate Lloyd's implementation;
    - lists: vec_id → nearest coarse centroid (the inverted-list key —
      at 100 TB this is the partition/bucket column, so a probe reads
      only its lists' files);
    - codebooks/codes: PQ trained on RESIDUALS (x − coarse centroid),
      which carry far less variance than raw vectors — the standard
      accuracy trick that makes m·log2(k) bits usable.
    """
    sub_full = subspace_split(embeddings, 1, dim)
    coarse = train_pq_codebooks(embeddings, m=1, k=n_lists, dim=dim, n_iter=n_iter, quant=quant)
    lists = _assign(sub_full, coarse).select("vec_id", F.col("code").alias("list_id"))
    residuals = (
        embeddings.join(lists, "vec_id")
        .join(
            coarse.select(F.col("centroid_id").alias("list_id"), F.col("embedding").alias("c_emb")),
            "list_id",
        )
        .select(
            "vec_id",
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("c_emb"),
                lambda x, y: x - y,
            ).alias("embedding"),
        )
        # checkpoint once: product training scans its corpus per Lloyd
        # iteration plus the init/encode passes — without this every scan
        # re-runs the coarse assignment agg and the residual join (~5×)
        .localCheckpoint()
    )
    codebooks = train_pq_codebooks(residuals, m=m, k=k, dim=dim, n_iter=n_iter, quant=quant)
    codes = pq_encode(residuals, codebooks, m=m, dim=dim).join(lists, "vec_id")
    return coarse, lists, codebooks, codes


def ivfpq_adc_topk(
    query: DataFrame,
    coarse: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    m: int = 4,
    dim: int = 64,
    n_probe: int = 2,
    k_neighbors: int = 5,
) -> DataFrame:
    """IVF-PQ search: probe the query's n_probe nearest lists, build one
    residual partial-distance table per probed list (n_probe × m × k
    rows, broadcast), ADC-score only vectors whose list was probed.

    Vectors outside the probed lists are never scored — that is the IVF
    recall/throughput trade, and at scale it is file pruning, not a
    filter: the codes table is partitioned by list_id.
    """
    w = dim // m
    q = query.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("q_emb")
    )
    c = coarse.select(F.col("centroid_id").alias("list_id"), F.col("embedding").alias("c_emb"))
    probed_w = Window.partitionBy("query_id").orderBy(
        F.asc("list_d2"), F.asc("list_id")
    )
    probed = (
        q.crossJoin(F.broadcast(c))
        .select(
            "query_id",
            "list_id",
            "c_emb",
            "q_emb",
            F.round(_l2sq(F.col("q_emb"), F.col("c_emb")), PQ_DIST_DECIMALS).alias("list_d2"),
        )
        .withColumn("rn", F.row_number().over(probed_w))
        .filter(F.col("rn") <= n_probe)
        .select(
            "query_id",
            "list_id",
            F.zip_with(F.col("q_emb"), F.col("c_emb"), lambda x, y: x - y).alias("remb"),
        )
    )
    cb = codebooks.select("sub_id", F.col("centroid_id").alias("code"), "embedding")
    table = probed.crossJoin(F.broadcast(cb)).select(
        "query_id",
        "list_id",
        "sub_id",
        "code",
        F.round(
            _l2sq(
                F.slice(F.col("remb"), F.col("sub_id") * w + 1, w),
                F.col("embedding"),
            ),
            PQ_DIST_DECIMALS,
        ).alias("pd2"),
    )
    exploded = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        "list_id",
        F.posexplode("codes").alias("sub_id", "code"),
    )
    return _adc_score(exploded, table, ["list_id", "sub_id", "code"], k_neighbors)


def ivfpq_rerank_topk(
    query: DataFrame,
    embeddings: DataFrame,
    coarse: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    m: int = 4,
    dim: int = 64,
    n_probe: int = 2,
    shortlist: int = 50,
    k_neighbors: int = 5,
) -> DataFrame:
    """ADC shortlist + EXACT re-rank — the production IVF-PQ recipe.

    On a weak-margin corpus the quantized ADC distance cannot separate
    rank 1 from rank 10 (measured here: median top1→top10 gap is ~20%
    of d1 while m=4×k=8 reconstruction error is larger), so ADC serves
    as a RECALL stage: take its top-`shortlist`, then compute exact L2
    against raw vectors for those ids only. At scale the exact stage
    touches shortlist × queries vectors — the shortlist is broadcast
    into the vector scan, so raw-vector IO stays proportional to the
    output, not the corpus.
    """
    cand = ivfpq_adc_topk(
        query, coarse, codebooks, codes, m=m, dim=dim, n_probe=n_probe, k_neighbors=shortlist
    ).select("query_id", "neighbor_id")
    raw = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("n_emb"),
    )
    q = query.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    exact = (
        raw.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_l2sq(F.col("q_emb"), F.col("n_emb")), PQ_DIST_DECIMALS).alias("exact_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("exact_d2"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", "exact_d2", F.col("rank").cast("long").alias("rank"))
    )


def _adc_score(
    exploded: DataFrame, table: DataFrame, join_keys: list, k_neighbors: int
) -> DataFrame:
    """Shared ADC tail: broadcast-join exploded codes against the partial
    table, sum per (query, neighbor), self-filter, deterministic top-k.
    One definition so the rounding/tie-break/rank contract the oracles
    replay cannot drift between the PQ and IVF-PQ entry points."""
    scored = (
        exploded.join(F.broadcast(table), join_keys)
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("pd2"), PQ_DIST_DECIMALS).alias("approx_d2"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    rank_w = Window.partitionBy("query_id").orderBy(F.asc("approx_d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", "approx_d2", F.col("rank").cast("long").alias("rank"))
    )


def pq_adc_topk(
    query: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    m: int = 4,
    dim: int = 64,
    k_neighbors: int = 5,
) -> DataFrame:
    """Asymmetric distance top-k: (query_id, neighbor_id, approx_d2, rank).

    `query` is a 1-row (or few-row) (vec_id, embedding) DataFrame. The
    partial-distance table is query_rows × m × k rows — broadcast — and
    the scan side touches only the code arrays.
    """
    qsub = subspace_split(query, m, dim).select(
        F.col("vec_id").alias("query_id"), "sub_id", F.col("sub_emb").alias("q_emb")
    )
    table = qsub.join(
        codebooks.select("sub_id", F.col("centroid_id").alias("code"), "embedding"),
        "sub_id",
    ).select(
        "query_id",
        "sub_id",
        "code",
        F.round(_l2sq(F.col("q_emb"), F.col("embedding")), PQ_DIST_DECIMALS).alias("pd2"),
    )
    exploded = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode("codes").alias("sub_id", "code"),
    )
    return _adc_score(exploded, table, ["sub_id", "code"], k_neighbors)

"""Deduplication operators for large-scale training-data pipelines.

All JVM-side (xxhash64 / bit ops inside whole-stage codegen) — no Python
in the hot path. Scale notes:
  - exact dedup: one hash aggregation, partial combine map-side;
  - MinHash+LSH: explode cost is n_docs × n_tokens rows, but the band
    signature groupBy reduces to n_docs × n_bands before the self-join —
    the candidate join is on band buckets, never all-pairs;
  - SimHash: pure column math, zero shuffle until the final fingerprint
    groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = r"\s+"


def exact_dedup(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the lowest doc_id per identical text (hash-groupBy)."""
    return (
        documents.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).cast("long").alias("n_copies"))
    )


def _tokens(text_col: str):
    return F.array_distinct(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT))


# seed separator for the portable hash (unit separator, collision-proof
# against token text)
_SEP = "\x1f"


def _seeded_hash(col, seed: int | None, hash_fn: str):
    """64-bit (xxhash64) or 60-bit (md5) token hash.

    xxhash64 is the fast engine default (one JVM intrinsic); md5 is the
    PORTABLE variant — `conv(substr(md5(x), 1, 15), 16, 10)` computes the
    identical integer in DuckDB (`('0x' || substr(md5(x), 1, 15))::BIGINT`),
    which is what lets the driver oracle these hash-defined operators
    instead of settling for rows-only checks.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(col) if seed is None else F.xxhash64(col, F.lit(seed))
    if hash_fn == "md5":
        seeded = col if seed is None else F.concat(col, F.lit(_SEP), F.lit(str(seed)))
        return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def minhash_signatures(
    documents: DataFrame,
    n_hashes: int = 16,
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    strategy: str = "explode",
) -> DataFrame:
    """doc_id → array of n_hashes min-hash values (seeded token hashes).

    Portable-md5 path (round 5): one md5 digest yields TWO independent
    60-bit hashes (hex chars 1-15 and 16-30), so n_hashes costs only
    ⌈n/2⌉ digests per token — md5 dominates this operator's profile and
    DuckDB replays the same substr chunking exactly. The digests are
    materialized in a projection BEFORE the aggregation so each is
    computed once per token row, not once per min() consuming it.

    strategy="hof": zero-shuffle variant — the per-document token array
    never explodes; one `transform` computes every token's hash vector
    in place and one `aggregate` folds them with element-wise `least`.
    Row-count and shuffle volume stay at n_docs (the explode path
    materializes n_docs × n_tokens rows and relies on map-side partial
    aggregation to shrink them back). Caveat that makes this an A/B
    rather than an unconditional win: higher-order-function lambdas are
    interpreted per element, outside whole-stage codegen, so the md5
    work itself runs slower per token — which side dominates is an
    empirical question. MEASURED (BENCH/minhash_hof_ab_result.txt):
    HOF wins signature-only (1.86 vs 2.04 s best at sf0.1/32 cores) but
    LOSES inside minhash_lsh_candidates (11.7 vs 8.9 s) because the
    explode path's groupBy shuffle is reused across both sides of the
    band self-join (ReusedExchange) while the shuffle-free plan
    recomputes the fold per side — so "explode" stays the default.
    """
    if strategy == "hof":
        return _minhash_signatures_hof(documents, n_hashes, text_col, hash_fn)
    toks = documents.select("doc_id", F.explode(_tokens(text_col)).alias("tok"))
    if hash_fn == "md5":
        n_digests = (n_hashes + 1) // 2
        digests = toks.select(
            "doc_id",
            *[
                F.md5(F.concat(F.col("tok"), F.lit(_SEP), F.lit(str(s)))).alias(f"d{s}")
                for s in range(n_digests)
            ],
        )
        mins = [
            F.min(
                F.conv(
                    F.substring(F.col(f"d{i // 2}"), 1 if i % 2 == 0 else 16, 15), 16, 10
                ).cast("long")
            ).alias(f"h{i}")
            for i in range(n_hashes)
        ]
        sig = digests.groupBy("doc_id").agg(*mins)
    else:
        mins = [
            F.min(_seeded_hash(F.col("tok"), i, hash_fn)).alias(f"h{i}")
            for i in range(n_hashes)
        ]
        sig = toks.groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(n_hashes)]).alias("signature"))


_MAX_LONG = (1 << 63) - 1


def _minhash_signatures_hof(
    documents: DataFrame, n_hashes: int, text_col: str, hash_fn: str
) -> DataFrame:
    """Shuffle-free minhash: transform + aggregate over the token array.

    Semantics identical to the explode path: min over DISTINCT tokens of
    the same seeded hashes (`_tokens` already applies array_distinct, and
    `split` never yields an empty array — "" splits to [""] — so every
    document keeps a row, matching the explode path's output set).
    """
    toks = _tokens(text_col)
    if hash_fn == "md5":
        n_digests = (n_hashes + 1) // 2
        # two transforms so each md5 is evaluated exactly once: HOF lambdas
        # are interpreted with no common-subexpression elimination, so a
        # digest column referenced by both of its 15-hex-char halves in one
        # lambda would run the md5 twice
        digest_vecs = F.transform(
            toks,
            lambda t: F.array(
                *[F.md5(F.concat(t, F.lit(_SEP), F.lit(str(s)))) for s in range(n_digests)]
            ),
        )
        vecs = F.transform(
            digest_vecs,
            lambda a: F.array(
                *[
                    F.conv(
                        F.substring(a[i // 2], 1 if i % 2 == 0 else 16, 15), 16, 10
                    ).cast("long")
                    for i in range(n_hashes)
                ]
            ),
        )
    else:
        vecs = F.transform(
            toks, lambda t: F.array(*[F.xxhash64(t, F.lit(i)) for i in range(n_hashes)])
        )
    zero = F.array(*[F.lit(_MAX_LONG).cast("long") for _ in range(n_hashes)])
    sig = F.aggregate(vecs, zero, lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)))
    return documents.select("doc_id", sig.alias("signature"))


def minhash_lsh_candidates(
    documents: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 4,
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    strategy: str = "explode",
) -> DataFrame:
    """Candidate near-dup pairs: band the signature, bucket-join per band.

    shingle → minhash → band → bucket-join; a pair is a candidate if any
    band of their signatures collides. Returns (doc_a, doc_b, n_bands_hit).
    The band bucket is the hashed signature slice under xxhash64 (compact)
    and the comma-joined slice itself under md5 (bucket equality IS slice
    equality, so the oracle needs no second hash function).
    """
    assert n_hashes % n_bands == 0
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(documents, n_hashes, text_col, hash_fn, strategy)

    def bucket(b: int):
        vals = [F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
        if hash_fn == "xxhash64":
            return F.xxhash64(*vals).cast("string")
        return F.concat_ws(",", *[v.cast("string") for v in vals])

    # round 6, two structural changes with identical output:
    #
    # 1. The per-doc band-bucket VECTOR is materialized once (lazy
    #    localCheckpoint, rebuilt per invocation). AQE broadcasts one
    #    side of the self-join below, which removes the shuffle whose
    #    ReusedExchange used to share the signature computation between
    #    the two sides — without this the full tokenize+md5 signature
    #    pass runs twice (measured).
    # 2. Each candidate pair is emitted EXACTLY ONCE — from its first
    #    colliding band — with n_bands_hit computed directly by
    #    comparing the two bucket vectors. The old shape emitted one row
    #    per colliding band and counted them in a pair-keyed hash agg,
    #    which shuffled every (pair, band) hit (11.2M rows at the sf0.1
    #    bench) through an extra Exchange; now the result streams
    #    straight out of the join. "Collides in band j" is bucket
    #    equality in both forms, so the pair set and the counts are
    #    unchanged for either hash_fn.
    # `hb` carries the exact band values as LONGS for the per-pair
    # comparisons (first-band filter + n_bands_hit): comparing the
    # ~70-char bucket strings cost 2.3 s of the join stage at sf0.1,
    # long comparisons are ~4× cheaper. For md5 the band value IS its
    # signature slice (concat_ws over a fixed count is injective), for
    # xxhash64 it is the single bucket long — both are exactly the
    # values whose string forms the join key compares, so the semantics
    # are unchanged.
    if hash_fn == "xxhash64":
        hb_vals = [
            F.xxhash64(
                *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
            )
            for b in range(n_bands)
        ]
        per_band = 1
    else:
        hb_vals = [F.col("signature")[i] for i in range(n_hashes)]
        per_band = rows_per_band
    wide = sig.select(
        "doc_id",
        F.array(*[bucket(b) for b in range(n_bands)]).alias("bkts"),
        F.array(*hb_vals).alias("hb"),
    ).localCheckpoint(eager=False)
    bands = wide.select("doc_id", "hb", F.posexplode("bkts").alias("band", "bucket"))
    a = bands.alias("a")
    b = bands.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )

    def hit(j: int):
        eqs = [
            F.get(F.col("a.hb"), j * per_band + r) == F.get(F.col("b.hb"), j * per_band + r)
            for r in range(per_band)
        ]
        cond = eqs[0]
        for e in eqs[1:]:
            cond = cond & e
        return cond
    first_band = None
    for j in range(n_bands - 1):
        # the emitting band is the pair's FIRST colliding band: no band
        # j strictly before it may also collide
        cond = (F.col("a.band") <= j) | ~hit(j)
        first_band = cond if first_band is None else (first_band & cond)
    n_hit = None
    for j in range(n_bands):
        term = hit(j).cast("long")
        n_hit = term if n_hit is None else (n_hit + term)
    out = joined if first_band is None else joined.filter(first_band)
    return out.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        n_hit.cast("long").alias("n_bands_hit"),
    )


def simhash(
    documents: DataFrame, text_col: str = "text", hash_fn: str = "xxhash64"
) -> DataFrame:
    """SimHash per document: per-token hash, sum of bit signs.

    bit_j(fingerprint) = 1 iff Σ_tokens sign(bit_j(hash(tok))) > 0.
    Expressed as n_bits conditional sums over the exploded token column.
    64 bits under xxhash64; 60 under the portable md5 variant (15 hex
    chars — see `_seeded_hash`).
    """
    n_bits = 64 if hash_fn == "xxhash64" else 60
    toks = documents.select("doc_id", F.explode(_tokens(text_col)).alias("tok"))
    h = _seeded_hash(F.col("tok"), None, hash_fn)
    sums = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(n_bits)
    ]
    agg = toks.groupBy("doc_id").agg(*sums)
    fingerprint = None
    for j in range(n_bits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        fingerprint = term if fingerprint is None else fingerprint.bitwiseXOR(term)
    return agg.select("doc_id", fingerprint.alias("simhash64"))


def simhash_near_dups(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Scale path: block on max_hamming+1 disjoint bit ranges (pigeonhole: a
    pair within distance d must agree exactly on ≥1 of d+1 blocks) →
    bucket-join per block, then exact hamming check via bit_count(xor).
    Deriving the block count from max_hamming keeps recall complete for
    any distance (the fixed 4-quarter scheme was silently lossy above 3).
    """
    assert 0 <= max_hamming <= 15, "blocks need ≥4 bits each for useful selectivity"
    n_blocks = max_hamming + 1
    # balanced partition of the 64 bits: the first 64 % n_blocks blocks get
    # one extra bit, so every block lies inside [0, 64) and none is empty
    # (a naive ceil-width scheme put later blocks past bit 63 — a negative
    # shift crash at some distances and a constant-zero block at others,
    # which silently degenerated that block's join to all-pairs)
    base, extra = divmod(64, n_blocks)
    starts, widths, pos = [], [], 0
    for q in range(n_blocks):
        w = base + (1 if q < extra else 0)
        starts.append(pos)
        widths.append(w)
        pos += w
    assert pos == 64

    def _mask(bits: int) -> int:
        return -1 if bits >= 64 else (1 << bits) - 1  # signed-64 all-ones

    fp = simhash(documents)
    quarters = fp.select(
        "doc_id",
        "simhash64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright("simhash64", starts[q])
                        .bitwiseAND(F.lit(_mask(widths[q])))
                        .alias("quarter"),
                    )
                    for q in range(n_blocks)
                ]
            )
        ).alias("qq"),
    ).select("doc_id", "simhash64", "qq.q", "qq.quarter")
    a = quarters.alias("a")
    b = quarters.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.quarter") == F.col("b.quarter"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash64").bitwiseXOR(F.col("b.simhash64"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def dedup_clusters(
    documents: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 4,
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    verify_threshold_pct: int | None = None,
) -> DataFrame:
    """Full near-dup dedup: LSH candidate pairs → connected components →
    one canonical doc per cluster (round 5).

    This is the production shape — candidate GENERATION alone (the other
    operators here) under-deduplicates transitively-similar groups: if
    A~B and B~C but A!~C, pairwise keep-the-smaller drops B twice and
    keeps both A and C, while the component view keeps exactly one of
    {A,B,C}. Reuses the engine's CC operator (operators/cc.py — the same
    driver-exact / large-small-star dispatch the KG pipeline uses), so
    the dedup graph inherits its skew handling and scale gates.

    Returns (doc_id, canonical_doc_id) for EVERY input document;
    canonical is the numeric-minimum member of the doc's near-dup
    component (docs in no candidate pair map to themselves). Doc ids are
    zero-padded to 12 digits before entering CC (its component ids are
    LEXICOGRAPHIC minima over string keys; padding makes lexicographic
    and numeric order agree) and cast back afterwards.

    `verify_threshold_pct` inserts the exact-Jaccard verification stage
    between candidates and clustering (verify_candidates_jaccard): LSH
    banding trades false positives for recall, and transitive merging
    AMPLIFIES false positives (one bad edge welds two genuine clusters),
    so production dedup verifies candidate edges before the closure.
    """
    from ..operators.cc import connected_components

    pairs = minhash_lsh_candidates(
        documents, n_hashes=n_hashes, n_bands=n_bands, text_col=text_col, hash_fn=hash_fn
    )
    if verify_threshold_pct is not None:
        pairs = verify_candidates_jaccard(
            documents, pairs, threshold_pct=verify_threshold_pct, text_col=text_col
        )

    def _pad(c):
        return F.lpad(c.cast("string"), 12, "0")

    edges = pairs.select(_pad(F.col("doc_a")).alias("src"), _pad(F.col("doc_b")).alias("dst"))
    labels = connected_components(edges)
    members = labels.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("canonical_doc_id"),
    )
    spine = documents.select("doc_id")
    return spine.join(members, "doc_id", "left").select(
        "doc_id",
        F.coalesce("canonical_doc_id", F.col("doc_id"))
        .cast("long")
        .alias("canonical_doc_id"),
    )


def verify_candidates_jaccard(
    documents: DataFrame,
    pairs: DataFrame,
    threshold_pct: int = 80,
    text_col: str = "text",
) -> DataFrame:
    """Exact distinct-token Jaccard verification of CANDIDATE pairs only
    — the stage between LSH candidate generation (recall) and cluster
    merge (precision). Unlike the quadratic all-pairs baseline, cost is
    O(candidates × doc_tokens): the token table joins the (small) pair
    table, never itself.

    Returns (doc_a, doc_b, n_shared, sz_a, sz_b) for pairs with
    Jaccard ≥ threshold_pct/100, integer math only
    (n_shared*100 >= threshold_pct*(sz_a+sz_b-n_shared)).
    """
    toks = documents.select(
        F.col("doc_id"), F.explode(_tokens(text_col)).alias("tok")
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    p = pairs.select("doc_a", "doc_b")
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        p.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("n_shared") * 100
            >= F.lit(threshold_pct) * (F.col("sz_a") + F.col("sz_b") - F.col("n_shared"))
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.col("sz_a").cast("long").alias("sz_a"),
            F.col("sz_b").cast("long").alias("sz_b"),
        )
    )


def semantic_dedup(
    vectors: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 2,
    threshold: float = 0.99,
    quant: int = 1_000_000,
) -> DataFrame:
    """Semantic deduplication over an embedding column — the SemDeDup
    recipe (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    corpus, then compare pairs ONLY within a cluster and drop every
    vector that has a near-identical lower-id neighbor there.

    The clustering is what makes this scale: the pairwise comparison is
    per-centroid-bucket, never all-pairs — with n_centroids grown
    proportionally to the corpus (the paper uses ~50k clusters for LAION
    -scale), per-bucket cost stays bounded while total work is
    O(n_vectors × avg_cluster_size). Centroids come from the engine's
    deterministic trained k-means (simsearch.train_centroids_kmeans:
    integer-quantized means, broadcast assignment), so the whole
    operator is replayable bit-identically in the DuckDB oracle.

    Keep contract (deterministic): a vector is dropped iff some SAME-
    CLUSTER vector with a smaller vec_id has rounded cosine ≥ threshold
    to it; the surviving lowest-id member represents each semantic-dup
    group. Cosines are rounded to IVF_COS_DECIMALS before the threshold
    compare so the two engines' different fp expression trees cannot
    disagree at the boundary (same rationale as ivf_assign).

    Returns one row per input vector: (vec_id, centroid_id, keep) with
    keep ∈ {0, 1} as BIGINT (exact-integer output for the oracle hash).
    """
    from .simsearch import IVF_COS_DECIMALS, _cos, ivf_assign, train_centroids_kmeans

    v = vectors.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = train_centroids_kmeans(
        v, n_centroids=n_centroids, n_iter=n_iter, quant=quant
    )
    assign = ivf_assign(v, cents, n_probe=1)
    a = assign.join(v, "vec_id")
    lo = a.select(
        "centroid_id",
        F.col("vec_id").alias("lo_id"),
        F.col("embedding").alias("lo_emb"),
    )
    hi = a.select(
        "centroid_id", F.col("vec_id").alias("vec_id"), F.col("embedding").alias("hi_emb")
    )
    dups = (
        lo.join(hi, "centroid_id")
        .filter(F.col("lo_id") < F.col("vec_id"))
        .filter(
            F.round(_cos(F.col("lo_emb"), F.col("hi_emb")), IVF_COS_DECIMALS)
            >= F.lit(threshold)
        )
        .select("vec_id")
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return assign.join(dups, "vec_id", "left").select(
        "vec_id",
        "centroid_id",
        F.when(F.col("is_dup").isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("keep"),
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination by exact k-gram overlap — the published
    recipe (GPT-3 App. C / PaLM: flag a training document when it shares
    any k-token gram with an evaluation set). Exact, not winnowed:
    decontamination wants zero false negatives, so EVERY k-gram is
    indexed, trading the ~(w+1)/2× storage winnowing would save.

    k-grams are hashed with the package's portable 60-bit md5 scheme
    (space-joined tokens) so the oracle replays them. The benchmark gram
    table is broadcast — eval sets are thousands of documents against a
    100 TB corpus, the canonical small-dimension join; per-doc gram sets
    are distinct-ed BEFORE the join so a repeated gram cannot double-
    count.

    Returns one row per corpus document: (doc_id, n_shared_grams,
    is_contaminated 0/1), where n_shared_grams counts DISTINCT shared
    grams.
    """
    def grams(df: DataFrame, col: str) -> DataFrame:
        words = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)
        n = F.size(words)
        idx = F.sequence(F.lit(1), n - (k - 1))
        hs = F.transform(
            idx,
            lambda i: F.conv(
                F.substring(F.md5(F.array_join(F.slice(words, i, k), " ")), 1, 15), 16, 10
            ).cast("long"),
        )
        hs = F.when(n >= k, F.array_distinct(hs)).otherwise(F.array().cast("array<long>"))
        return df.select(F.col(id_col).alias(col), F.explode(hs).alias("gram"))

    bench = grams(benchmark, "bench_id").select("gram").distinct()
    doc_grams = grams(documents, id_col)
    shared = (
        doc_grams.join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )
    spine = documents.select(id_col)
    return spine.join(shared, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_shared_grams", F.lit(0)).cast("long").alias("n_shared_grams"),
        F.when(F.coalesce("n_shared_grams", F.lit(0)) > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_contaminated"),
    )


def bloom_cross_dedup(
    seen: DataFrame,
    incoming: DataFrame,
    m_bits: int = 65536,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-snapshot Bloom-filter dedup (Bloom, CACM 1970): flag every
    INCOMING document whose content fingerprint is possibly already in
    the SEEN snapshot — the membership test a rolling crawl runs against
    last month's corpus before paying for full near-dup comparison.
    One-sided: a true re-crawl is NEVER missed (all k of its bit
    positions were set by the identical seen text); a fresh document is
    flagged only on a k-way hash collision, probability ≈ (1−e^(−kn/m))^k
    for n seen docs — size m_bits accordingly.

    Representation: the filter is the DISTINCT SET of set bit positions,
    at most min(k·n, m_bits) rows of one long each, explicitly
    broadcast. On a real cluster the same semantics compress into an
    actual m-bit bitmap (Spark's native `bloom_filter_agg` or a
    treeAggregate'd bytearray); the positions-table form is chosen here
    because it is engine-portable — every position is a pure md5
    function of the text, so the DuckDB oracle rebuilds the identical
    filter — and plan-wise it already exercises the broadcast-semi-join
    shape the bitmap variant would use. The fingerprint is md5(text);
    position j is the portable 60-bit md5 prefix of the salted
    fingerprint mod m_bits.

    Physical shape: seen side = projection → k-element explode →
    distinct (hash agg bounded by m_bits); incoming side = the same
    projection LEFT-joined to the broadcast bit set carrying a hit
    marker, then ONE doc_id-keyed hash agg computes maybe_seen =
    "every one of my DISTINCT positions matched" (positions of one doc
    can collide with each other, hence array_distinct before explode).
    No shuffle keyed wider than m_bits plus that single doc_id agg.
    Returns (doc_id, maybe_seen) for every incoming document.
    """
    def positions(df: DataFrame):
        fp = F.md5(F.col(text_col))
        pos = F.array(*[
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"bloom{j}{_SEP}"), fp)), 1, 15),
                    16,
                    10,
                ).cast("long"),
                F.lit(m_bits),
            )
            for j in range(k)
        ])
        return df.select(F.col(id_col), F.explode(F.array_distinct(pos)).alias("pos"))

    bits = positions(seen).select("pos").distinct().withColumn("hit", F.lit(1))
    inc = positions(incoming)
    return (
        inc.join(F.broadcast(bits), "pos", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.count("hit").alias("n_hit"),
        )
        .select(
            F.col(id_col),
            F.when(F.col("n_hit") == F.col("n_pos"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("maybe_seen"),
        )
    )


def duplicate_spans(
    documents: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring deduplication, the k-gram-anchored re-expression
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"): find every MAXIMAL token span of length ≥ k that
    also appears in at least `min_docs` documents. The suffix-array
    construction of the paper is a single-machine algorithm; the
    anchoring identity that makes it distributable is that a duplicated
    span of length L ≥ k is exactly a run of L−k+1 consecutive
    duplicated k-grams — so k-gram doc-frequency (one hash agg) plus a
    per-document gaps-and-islands merge reconstructs the maximal spans.

    Physical shape: tokenize → posexplode the per-position k-gram
    hashes (md5 of the joined window — the shuffle key is a 32-char
    hash, never the text) → ONE gram-keyed agg for doc-frequency (skew
    = a hot gram's doc list, the same bound every LSH band join here
    carries) → join marked positions back → ONE doc-keyed agg whose
    sorted-position fold merges overlapping windows into maximal spans
    (a higher-order aggregate, not a window function — per-doc state is
    bounded by the doc's own marked positions). Nothing driver-side.

    Returns (doc_id, span_start, span_end, span_tokens) with 0-based
    inclusive token indices; docs shorter than k or with no duplicated
    grams are absent.
    """
    words = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)
    n = F.size(words)
    # round 6: the gram key is unhex(md5) — the same 128-bit digest as 16
    # raw bytes instead of 32 hex chars, halving the bytes every gram-keyed
    # exchange and join carries (guide §2.3 "narrower types"); gram
    # equality is unchanged, and the key never reaches the output.
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.unhex(F.md5(F.array_join(F.slice(words, i + 1, k), " "))),
        ),
    ).otherwise(F.array().cast("array<binary>"))
    g = documents.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gh")
    )
    # round 6: doc-frequency filter and position mark-back fused into ONE
    # gram-keyed aggregation — collect each gram's occurrence list, keep
    # grams whose occurrences span ≥ min_docs distinct docs, and explode
    # the survivors back to (doc, pos). The old shape aggregated g and
    # then joined g against the result, which evaluated the per-position
    # md5 pass twice (no exchange reuse across the join's two subtrees —
    # measured) and paid a second gram-keyed shuffle. Per-group state is
    # a hot gram's occurrence list — the same skew bound the docstring
    # already carries for its doc list.
    occ = g.groupBy("gh").agg(
        F.collect_list(F.struct(id_col, "pos")).alias("occs")
    )
    occ = occ.filter(
        F.size(F.array_distinct(F.transform("occs", lambda x: x[id_col])))
        >= int(min_docs)
    )
    marked = occ.select(F.explode("occs").alias("o")).select(
        F.col(f"o.{id_col}").alias(id_col), F.col("o.pos").alias("pos")
    )
    # gaps-and-islands over the sorted positions: windows [p, p+k-1] and
    # [q, q+k-1] belong to one span iff q <= p + k. Round 6 replaces the
    # accumulate-an-array fold (each step copied the whole accumulator —
    # O(n²) array bytes per doc, and the bench corpus marks nearly every
    # position) with the linear boundary formulation: an island STARTS at
    # position i where i is first or gap > k, ENDS where i is last or the
    # next gap > k; starts and ends pair up 1:1 in order.
    p = F.col("_ps")
    np_ = F.size(p)
    idx = F.sequence(F.lit(1), np_)
    gap_before = lambda i: F.get(p, i - 1) > F.get(p, i - 2) + F.lit(k)  # noqa: E731
    starts = F.filter(idx, lambda i: (i == 1) | gap_before(i))
    ends = F.filter(idx, lambda i: (i == np_) | gap_before(i + 1))
    islands = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            F.get(p, s - 1).alias("s"), F.get(p, e - 1).alias("e")
        ),
    )
    return (
        marked.groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_ps"))
        .select(id_col, F.explode(islands).alias("island"))
        .select(
            id_col,
            F.col("island.s").cast("long").alias("span_start"),
            (F.col("island.e") + F.lit(k - 1)).cast("long").alias("span_end"),
            (F.col("island.e") + F.lit(k) - F.col("island.s"))
            .cast("long")
            .alias("span_tokens"),
        )
    )


def strip_duplicate_spans(
    documents: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The removal pass over `duplicate_spans`: rebuild each document's
    text with every cross-document duplicated span dropped — the actual
    Lee-et-al. transform a training-data pipeline ships (their result:
    removing duplicated substrings IMPROVES the trained model).

    Physical shape: the span table groups to one array per affected doc
    (bounded by that doc's own span count), left-joins back on the id —
    never on text — and token filtering is a per-row higher-order
    `filter` over the split array: no explode, no second shuffle, and
    untouched documents stream through the join unmodified. Returns
    (doc_id, text) with the SAME schema contract as the input so the
    pass composes with every downstream text operator.
    """
    spans = duplicate_spans(
        documents, k=k, min_docs=min_docs, id_col=id_col, text_col=text_col
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    words = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)
    covered = lambda i: F.coalesce(
        F.exists(
            F.col("spans"),
            lambda sp: (i >= sp["span_start"]) & (i <= sp["span_end"]),
        ),
        F.lit(False),
    )
    return documents.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.array_join(
            F.filter(words, lambda w, i: ~covered(i.cast("long"))), " "
        ).alias(text_col),
    )

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


def minhash_signatures(
    documents: DataFrame, n_hashes: int = 16, text_col: str = "text"
) -> DataFrame:
    """doc_id → array of n_hashes min-hash values (xxhash64 with seed=i)."""
    toks = documents.select("doc_id", F.explode(_tokens(text_col)).alias("tok"))
    mins = [
        F.min(F.xxhash64(F.col("tok"), F.lit(i))).alias(f"h{i}") for i in range(n_hashes)
    ]
    sig = toks.groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(n_hashes)]).alias("signature"))


def minhash_lsh_candidates(
    documents: DataFrame, n_hashes: int = 16, n_bands: int = 4, text_col: str = "text"
) -> DataFrame:
    """Candidate near-dup pairs: band the signature, bucket-join per band.

    shingle → minhash → band → bucket-join; a pair is a candidate if any
    band of their signatures collides. Returns (doc_a, doc_b, n_bands_hit).
    """
    assert n_hashes % n_bands == 0
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(documents, n_hashes, text_col)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_bands_hit"))
    )


def simhash(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, sum of bit signs.

    bit_j(fingerprint) = 1 iff Σ_tokens sign(bit_j(hash(tok))) > 0.
    Expressed as 64 conditional sums over the exploded token column.
    """
    toks = documents.select("doc_id", F.explode(_tokens(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    sums = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(64)
    ]
    agg = toks.groupBy("doc_id").agg(*sums)
    fingerprint = None
    for j in range(64):
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
    width = -(-64 // n_blocks)  # ceil; last block may be narrower

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
                        F.shiftright("simhash64", q * width)
                        .bitwiseAND(F.lit(_mask(min(width, 64 - q * width))))
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

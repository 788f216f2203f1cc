"""Deterministic corpus sampling for training-data curation.

A training mix is built by DOWN-sampling over-represented strata (the
crawl's English skew) and keeping rare strata whole — per-stratum
Bernoulli rates. The decisions here are a pure function of
(doc_id, salt): no RNG state, no seed plumbing, identical across
retries, executors, engines and runs — the property that makes a 100 TB
sampling job resumable and its output auditable row-by-row.

Physical shape: one shuffle-free projection + filter (the rate map is a
literal CASE expression, the keep test a per-row md5) — whole-stage
codegen end to end, composes with parquet predicate pushdown upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PPM = 1_000_000


def stratified_sample(
    documents: DataFrame,
    rates_ppm: dict,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "s0",
    default_ppm: int = 0,
) -> DataFrame:
    """Keep each row iff hash(id, salt) mod 1e6 < its stratum's rate
    (parts-per-million). Unlisted strata get `default_ppm`.

    The hash is the portable 60-bit md5 prefix used across this package
    (replayed verbatim by the DuckDB oracle); `salt` decouples this
    decision from every other md5 of the same id, and changing it draws
    an independent sample — the knob for resampling epochs.

    Expected kept fraction per stratum is rate_ppm/1e6 with the usual
    Bernoulli variance; exact-quota sampling would need a per-stratum
    sort (a shuffle and a skew point) for a guarantee training mixes
    don't require.
    """
    expr = F.lit(int(default_ppm))
    for stratum, ppm in sorted(rates_ppm.items()):
        expr = F.when(F.col(strata_col) == stratum, F.lit(int(ppm))).otherwise(expr)
    draw = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("\x1f" + salt))), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(PPM),
    )
    return documents.filter(draw < expr)


def _hashed_features(df: DataFrame, dim: int, id_col: str, text_col: str) -> DataFrame:
    """Hashed n-gram feature occurrences: one row per (doc, feature
    occurrence) with the feature's md5 bucket in [0, dim). Features are
    word unigrams plus word bigrams (the DSIR paper's recipe, Xie et al.
    2023 §3.1), bigrams joined with a single space; the bucket hash is
    the package's portable 60-bit md5 prefix so DuckDB replays it.

    Emitted as a projection + two explodes unioned — shuffle-free; every
    downstream consumer aggregates by bucket, whose cardinality is
    bounded by `dim` regardless of corpus size.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tokens = F.size(words)
    bigrams = F.when(
        n_tokens >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tokens - 1),
            lambda i: F.array_join(F.slice(words, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(words, bigrams)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("feat")), 1, 15), 16, 10).cast("long"),
        F.lit(dim),
    )
    return (
        df.select(F.col(id_col), F.explode(feats).alias("feat"))
        .select(F.col(id_col), bucket.alias("bucket"))
    )


def dsir_weights(
    documents: DataFrame,
    target: DataFrame,
    dim: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance Resampling,
    Xie et al., NeurIPS 2023): score every raw document by how much more
    likely its hashed n-gram features are under a TARGET exemplar set
    than under the raw pool itself — log p_target(doc) − log p_raw(doc)
    under bag-of-hashed-features models with add-one smoothing. Positive
    scores mean "looks like the target distribution"; the training mix
    keeps a sample weighted by exp(score) (the resampling step is
    `stratified_sample` on score bands — policy, not computed here).

    Exact-integer contract (the tfidf_vectors pattern): the only fp ops
    are two `ln`s per BUCKET — lr_micro[b] = round((ln((t_cnt+1)/
    (t_total+dim)) − ln((r_cnt+1)/(r_total+dim))) · 1e6) — i.e. at most
    2·dim of them for the whole corpus, after which each document's
    score is a pure BIGINT sum of tf·lr_micro, associative-order
    independent, bit-identical between Spark's partial aggregation and
    a serial oracle scan.

    Scale shape: the two distribution estimates are hash aggregations
    whose OUTPUT is at most `dim` rows each (map-side combine collapses
    the token stream executor-side — the same bounded-state property
    that makes hashed features work at all); the log-ratio table is
    exactly `dim` rows and is explicitly broadcast, so scoring is a
    broadcast join + one map-side-combinable hash agg on doc_id. No
    join key in the plan has cardinality above `dim` except doc_id
    itself. Returns (doc_id, n_features, dsir_micro).
    """
    raw_feats = _hashed_features(documents, dim, id_col, text_col)
    tgt_feats = _hashed_features(target, dim, id_col, text_col)
    # round 6: ONE feature-hash pass per side. The totals are by definition
    # the sums of the per-bucket counts (buckets partition the feature
    # stream), and the raw bucket counts are the column sums of the per-doc
    # tf table — all exact integer identities, so deriving them instead of
    # re-aggregating the exploded md5 stream removes two full raw-side
    # scans and one target-side scan (the md5 explode dominated this
    # operator's profile: 2.7 s of the 4.3 s total at sf0.1). Exchange
    # reuse does NOT fire across the broadcast-subtree boundaries here
    # (measured: 10 Generate nodes, 0 ReusedExchange), so the two shared
    # tables are materialized once with a lazy localCheckpoint — doc_tf is
    # n_docs × ≤dim rows of three BIGINTs, t_cnt is ≤dim rows.
    doc_tf = (
        raw_feats.groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    t_cnt = (
        tgt_feats.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("t_cnt"))
        .localCheckpoint(eager=False)
    )
    r_cnt = doc_tf.groupBy("bucket").agg(F.sum("tf").alias("r_cnt"))
    t_tot = t_cnt.agg(F.coalesce(F.sum("t_cnt"), F.lit(0)).alias("t_total"))
    r_tot = r_cnt.agg(F.coalesce(F.sum("r_cnt"), F.lit(0)).alias("r_total"))
    # dense bucket spine so absent buckets still carry their smoothed
    # log-ratio (a target-only bucket must PENALIZE raw docs that hit it).
    # The count tables are provably ≤ dim rows — broadcast them
    # explicitly rather than trusting runtime statistics (the same
    # robustness rule the link phase learned the hard way).
    spine = documents.sparkSession.range(dim).select(F.col("id").alias("bucket"))
    lr = (
        spine.join(F.broadcast(t_cnt), "bucket", "left")
        .join(F.broadcast(r_cnt), "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.coalesce("t_cnt", F.lit(0)) + F.lit(1.0))
                        / (F.col("t_total") + F.lit(float(dim)))
                    )
                    - F.log(
                        (F.coalesce("r_cnt", F.lit(0)) + F.lit(1.0))
                        / (F.col("r_total") + F.lit(float(dim)))
                    )
                )
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    return (
        doc_tf.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_features"),
            F.sum(F.col("tf") * F.col("lr_micro")).cast("long").alias("dsir_micro"),
        )
    )

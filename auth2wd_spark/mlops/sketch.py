"""Streaming-style frequency sketches for corpus statistics at 100 TB.

Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) over the
corpus token stream, plus heavy-hitter extraction on top of it. The
sketch's value on a cluster is its BOUNDED AGGREGATION STATE: a
`groupBy(row, bucket)` over the raw token stream partial-combines into
at most depth×width cells per task regardless of vocabulary size —
exactly the property that lets a 100 TB frequency pass run without a
vocabulary-sized shuffle. Every hash is the package's portable 60-bit
md5 prefix so the DuckDB oracle replays the sketch bit-identically.

The classic guarantee: with width w and depth d, the estimate for any
term t satisfies  exact(t) ≤ est(t) ≤ exact(t) + 2·N/w  with
probability ≥ 1 − 2^−d (N = total token count) — overestimates only,
never under. `cms_heavy_hitters` therefore never MISSES a true heavy
hitter; it can only include near-threshold false positives, which the
verification column exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = r"\s+"


def _bucket(term_col, row: int, width: int):
    """Row `row`'s hash of a term into [0, width): portable md5 over the
    salted term, replayable verbatim by the oracle."""
    salted = F.concat(F.lit(f"cms{row}\x1f"), term_col)
    return F.pmod(
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long"),
        F.lit(width),
    )


def cms_sketch(
    documents: DataFrame,
    depth: int = 4,
    width: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Build the count-min sketch of the corpus token stream: one row
    per non-empty (row, bucket) cell with its count.

    Physical shape: explode(tokens) → a depth-way projection union →
    ONE hash aggregation keyed on (row, bucket). The aggregation's key
    space is depth×width cells, so map-side combine collapses each
    task's token stream into at most that many rows before any shuffle
    — the sketch IS the partial-aggregation state, which is the whole
    point at web scale. Output ≤ depth·width rows total.
    """
    toks = documents.select(F.explode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)).alias("term"))
    rows = [
        toks.select(F.lit(i).alias("row"), _bucket(F.col("term"), i, width).alias("bucket"))
        for i in range(depth)
    ]
    cells = rows[0]
    for r in rows[1:]:
        cells = cells.unionAll(r)
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cms_heavy_hitters(
    documents: DataFrame,
    threshold: int | None = None,
    depth: int = 4,
    width: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int | None = None,
) -> DataFrame:
    """Heavy hitters via the count-min sketch: every DISTINCT term whose
    sketch estimate (min over the depth rows of its cell counts) reaches
    the threshold, with the exact count alongside.

    The threshold is either absolute (`threshold` occurrences) or
    relative (`threshold_ppm` parts-per-million of the total token
    count — the scale-invariant form a recurring corpus job wants). The
    relative test is pure BIGINT arithmetic, `est·1e6 ≥ total·ppm`, so
    no fp division can disagree between engines.

    Returns (term, cms_est, exact_cnt). `exact_cnt` is the verification
    column — it exists to expose the sketch's one-sided error
    (cms_est ≥ exact_cnt always; strict overestimates are collision
    victims). A production pass over 100 TB DROPS it: the candidate
    stream is filtered on the broadcast sketch alone, and the exact
    count — whose aggregation state is vocabulary-sized, not
    sketch-sized — is computed only for the tiny surviving candidate
    set, turning a vocabulary-wide shuffle into a heavy-hitter-wide one.

    Physical shape: the sketch (≤ depth·width rows) is explicitly
    broadcast; candidates = the per-term exact agg (doc_freq-bounded
    skew, same argument as textqc.term_stats); each candidate fans out
    to its `depth` cells, joins the broadcast sketch, and a fixed-size
    min-agg on term produces the estimate. One vocabulary-keyed hash
    agg, one broadcast join — no shuffle keyed on anything wider.
    """
    sketch = cms_sketch(documents, depth=depth, width=width, id_col=id_col, text_col=text_col)
    toks = documents.select(F.explode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)).alias("term"))
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    probes = exact.select(
        "term",
        "exact_cnt",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("row"), _bucket(F.col("term"), i, width).alias("bucket"))
                for i in range(depth)
            ])
        ).alias("cell"),
    ).select("term", "exact_cnt", F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )
    if (threshold is None) == (threshold_ppm is None):
        raise ValueError("pass exactly one of threshold / threshold_ppm")
    if threshold_ppm is not None:
        total = toks.agg(F.count(F.lit(1)).alias("total"))
        est = est.crossJoin(F.broadcast(total)).filter(
            F.col("cms_est") * F.lit(1_000_000) >= F.col("total") * F.lit(int(threshold_ppm))
        )
    else:
        est = est.filter(F.col("cms_est") >= int(threshold))
    return est.select("term", "cms_est", "exact_cnt")

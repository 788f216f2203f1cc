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

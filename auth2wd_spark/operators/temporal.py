"""Temporal joins Spark lacks as built-ins: as-of join and range join.

A web-scale KG build is full of temporal alignment problems the
reference sidesteps by doing live HTTP at conversion time
(external_importer.rs fetches the CURRENT authority record): at crawl
scale the id→QID mapping, the validity tables and the page snapshots
all carry timestamps, and "which mapping was valid when this page was
crawled" is an as-of join, while "which events fall inside this
session/window" is a range join. Both get first-class operators here
because the naive expressions are scale-killers — an as-of join written
as a non-equi join is O(n·m) per key, and a range join written as a
cross join with a BETWEEN filter never survives 100 TB.

Design (both single-shuffle, no Cartesian anywhere):

``asof_join``
    UNION + WINDOW, not a join at all: tag right rows 0 and left rows
    1, union them on (keys, ts, tag, payload-struct), sort each key
    partition by (ts, tag) and take ``last(payload, ignorenulls=True)``
    over the preceding rows. One Exchange on the key columns, linear
    scan per partition — the classic log-structured merge trick. The
    matched right row for a left row at time t is the greatest
    right.ts ≤ t (backward) or smallest right.ts ≥ t (forward), ties
    on right.ts broken by the largest payload struct (deterministic).

``range_join``
    Fixed-width time-bucket binning: intervals explode to the buckets
    they cover (``F.sequence`` — bounded by interval_length/width),
    points land in exactly ONE bucket, and the pair match is an
    equi-join on (keys, bucket) + an exact boundary filter. Because a
    point belongs to exactly one bucket, every true pair is produced
    exactly once — no post-join distinct. Choose ``bucket_width_s``
    near the median interval length: too small explodes intervals
    across many buckets, too wide packs unrelated rows into one bucket
    (both degrade gracefully, neither is Cartesian).

At 100 TB both operators shuffle once on (keys[, bucket]) and stream
per-partition; a pathological hot key (one user with a billion events)
concentrates on one reducer exactly like any per-key window — the
salting escape is to pre-split such keys by coarse time range and
carry the last right row of each range forward, which composes from
these same primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_MICROS = 1_000_000


def _epoch_us(df: DataFrame, colname: str) -> Column:
    """Epoch microseconds for TIMESTAMP *and* TIMESTAMP_NTZ columns.

    ``F.unix_micros`` rejects TIMESTAMP_NTZ (the type parquet test data
    carries), so measure from a same-typed epoch literal instead —
    timestamp_diff is type-homogeneous and tz-independent.
    """
    dt = dict(df.dtypes)[colname]
    epoch = (
        F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
        if dt.startswith("timestamp_ntz")
        else F.expr("TIMESTAMP '1970-01-01 00:00:00Z'")
    )
    return F.timestamp_diff("MICROSECOND", epoch, F.col(colname))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: attach to every left row the temporally nearest
    right row per key (backward: greatest right_ts ≤ left_ts; forward:
    smallest right_ts ≥ left_ts). Unmatched left rows keep NULLs (and a
    match farther than ``tolerance_s`` seconds is nulled out, matching
    pandas.merge_asof semantics).

    Right payload columns arrive suffixed; the matched right timestamp
    arrives as ``{right_ts}{suffix}``. Ties on (key, right_ts) resolve
    to the lexicographically largest payload struct — deterministic
    regardless of partitioning. Both ts columns may be TIMESTAMP or
    TIMESTAMP_NTZ (``tolerance_s`` compares timestamp_diff micros);
    ``__t``/``__is_left``/``__rp`` are reserved column names.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    if right_ts not in payload_cols:
        raise ValueError(f"right_ts {right_ts!r} missing from right columns")

    rp = F.struct(*[F.col(c) for c in payload_cols]).alias("__rp")
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        rp,
    )
    left_cols = [F.col(c) for c in left.columns]
    l_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_tagged.schema["__rp"].dataType).alias("__rp"),
    )
    # right rows carry only (keys, __t, __is_left, __rp); fill the left
    # columns with NULLs via unionByName(allowMissingColumns)
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # __rp ASC in BOTH directions: within an equal-(key, ts) group of
    # right rows the walk ends on the largest payload struct, which is
    # what last() picks — the documented deterministic tie-break
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    order = [t_order, F.col("__is_left").asc(), F.col("__rp").asc()]
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__rp", ignorenulls=True).over(w))
    out = matched.filter(F.col("__is_left") == 1)

    if tolerance_s is not None:
        gap = F.abs(
            # same-typed operands, NTZ-safe (see _epoch_us)
            F.timestamp_diff("MICROSECOND", F.col(f"__match.{right_ts}"), F.col("__t"))
        )
        out = out.withColumn(
            "__match",
            F.when(gap <= int(tolerance_s * _MICROS), F.col("__match")),
        )

    proj = [F.col(c) for c in left.columns]
    for c in payload_cols:
        proj.append(F.col(f"__match.{c}").alias(f"{c}{suffix}"))
    return out.select(*proj)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | str | None = None,
    bucket_width_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with
    ``start ≤ point_ts < end`` (closed-open) sharing the optional key
    columns — without a Cartesian product.

    Intervals explode onto the fixed-width buckets they cover; a point
    is in exactly one bucket, so the (keys, bucket) equi-join emits each
    true pair exactly once and the boundary filter is exact. ``how``
    may be "inner" or "left" (unmatched points keep NULL interval
    columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    width = int(bucket_width_s) * _MICROS
    if width <= 0:
        raise ValueError("bucket_width_s must be positive")

    def _fdiv(a: Column) -> Column:
        # exact floor division of BIGINT micros by the width literal:
        # subtracting pmod makes the numerator an exact multiple of the
        # divisor, so the double divide cannot round across a bucket
        # boundary (a plain floor(a / w) can, at ~1.8e15-micro epochs);
        # pmod (not %) keeps floor semantics for pre-1970 timestamps
        return ((a - F.pmod(a, F.lit(width))) / width).cast("long")

    # empty intervals ([start, end) with end ≤ start) match nothing under
    # closed-open semantics — drop them BEFORE the explode, where they
    # would otherwise make F.sequence emit a DESCENDING bucket range
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    # end is EXCLUSIVE: an interval ending exactly on a bucket boundary
    # does not cover that bucket, hence the -1 before the floor-div
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _fdiv(_epoch_us(intervals, start_col)),
                _fdiv(_epoch_us(intervals, end_col) - 1),
            )
        ),
    )
    pt = points.withColumn("__bucket", _fdiv(_epoch_us(points, point_ts)))
    # (bucket + keys) equalities stay visible to the planner as equi-join
    # keys; the exact boundary check rides along as a join-side filter
    conj = pt["__bucket"] == iv["__bucket"]
    for k in keys:
        conj = conj & (pt[k] == iv[k])
    exact = (iv[start_col] <= pt[point_ts]) & (pt[point_ts] < iv[end_col])
    joined = pt.join(iv, conj & exact, how)
    dup = {k for k in keys}
    proj = [pt[c].alias(c) for c in points.columns]
    proj += [iv[c].alias(c) for c in intervals.columns if c not in dup]
    return joined.select(*proj)

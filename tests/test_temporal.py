"""operators/temporal: as-of join and range join.

Correctness is pinned three ways: hand-computed micro-cases for every
boundary (equality, ties, tolerance, direction, exclusive interval
end), a randomized cross-check against pandas.merge_asof (the public
reference implementation of as-of semantics), and plan pins proving the
scale posture — asof_join plans ONE Exchange and ZERO join nodes;
range_join never plans a Cartesian/BroadcastNestedLoop.
"""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from auth2wd_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2026, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture()
def left(spark):
    return spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(20)), (3, 200, _ts(5)), (4, 300, _ts(30))],
        "lid long, key long, ts timestamp",
    )


@pytest.fixture()
def right(spark):
    return spark.createDataFrame(
        [
            (11, 100, _ts(10)),  # equality with lid=1
            (12, 100, _ts(15)),  # between lid=1 and lid=2
            (13, 200, _ts(6)),  # after lid=3 (forward-only match)
            (14, 300, _ts(1)),  # 29 minutes before lid=4
        ],
        "rid long, key long, ts timestamp",
    )


def _matches(df):
    return {r["lid"]: r["rid_right"] for r in df.collect()}


def test_asof_backward_with_equality_and_nulls(left, right):
    out = asof_join(left, right, on="key")
    assert _matches(out) == {1: 11, 2: 12, 3: None, 4: 14}
    # matched right ts rides along suffixed
    row = {r["lid"]: r["ts_right"] for r in out.collect()}
    assert row[2] == _ts(15) and row[3] is None


def test_asof_forward(left, right):
    out = asof_join(left, right, on="key", direction="forward")
    assert _matches(out) == {1: 11, 2: None, 3: 13, 4: None}


def test_asof_tolerance_nulls_far_matches(left, right):
    out = asof_join(left, right, on="key", tolerance_s=600)
    # lid=4's nearest click is 29 min back — outside the 10-min tolerance
    assert _matches(out) == {1: 11, 2: 12, 3: None, 4: None}


def test_asof_tie_on_right_ts_is_deterministic(spark, left):
    # two right rows at the SAME (key, ts): the documented tie-break is
    # the largest payload struct, i.e. rid=92 wins over rid=91
    right = spark.createDataFrame(
        [(91, 100, _ts(8)), (92, 100, _ts(8))], "rid long, key long, ts timestamp"
    )
    out = asof_join(left.filter("lid = 1"), right, on="key")
    assert _matches(out) == {1: 92}


def test_asof_matches_pandas_merge_asof_randomized(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n_l, n_r = 400, 300
    lpdf = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "key": rng.integers(0, 12, n_l),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 100_000, n_l), unit="s"),
        }
    )
    rpdf = pd.DataFrame(
        {
            "rid": np.arange(n_r),
            "key": rng.integers(0, 12, n_r),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 100_000, n_r), unit="s"),
        }
    )
    # merge_asof breaks right-ts ties by ROW ORDER, ours by max payload:
    # dedup right to one row per (key, ts) so both definitions coincide
    rpdf = rpdf.sort_values("rid").groupby(["key", "ts"], as_index=False).last()
    for direction in ("backward", "forward"):
        want = pd.merge_asof(
            lpdf.sort_values("ts"),
            rpdf.sort_values("ts"),
            on="ts",
            by="key",
            direction=direction,
            suffixes=("", "_right"),
        )
        got = asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on="key",
            direction=direction,
        ).toPandas()
        want_map = dict(zip(want["lid"], want["rid"]))
        got_map = dict(zip(got["lid"], got["rid_right"]))
        assert len(got_map) == n_l
        for lid in range(n_l):
            w = want_map[lid]
            g = got_map[lid]
            assert (pd.isna(w) and pd.isna(g)) or w == g, (direction, lid, w, g)


def test_asof_plan_one_exchange_no_join(left, right):
    out = asof_join(left, right, on="key")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    # ONE hash-partitioning Exchange feeds the window (union sides may
    # show the same exchange reused, never a second distinct shuffle)
    import re

    exchanges = {
        m.group(0)
        for m in re.finditer(r"Exchange hashpartitioning\([^)]*\)[^\n]*", plan)
    }
    assert len(exchanges) == 1, plan


# ---------------------------------------------------------------------------


@pytest.fixture()
def intervals(spark):
    return spark.createDataFrame(
        [
            (1, 100, _ts(0), _ts(60)),
            (2, 100, _ts(45), _ts(75)),  # overlaps interval 1
            (3, 200, _ts(0), _ts(240)),  # spans multiple 1h buckets
        ],
        "win_id long, key long, start_ts timestamp, end_ts timestamp",
    )


@pytest.fixture()
def points(spark):
    return spark.createDataFrame(
        [
            (1, 100, _ts(0)),  # == start of win 1: INCLUDED
            (2, 100, _ts(59)),  # inside win 1 only... and win 2 (45-75)
            (3, 100, _ts(60)),  # == end of win 1: EXCLUDED; inside win 2
            (4, 200, _ts(239)),  # last minute of the long window
            (5, 200, _ts(240)),  # == its exclusive end
            (6, 300, _ts(10)),  # keyless-in-intervals user
        ],
        "pid long, key long, ts timestamp",
    )


def _pairs(df):
    return {(r["pid"], r["win_id"]) for r in df.collect()}


def test_range_join_boundaries_and_multi_bucket(points, intervals):
    out = range_join(
        points, intervals, point_ts="ts", start_col="start_ts",
        end_col="end_ts", on="key", bucket_width_s=3600,
    )
    assert _pairs(out) == {(1, 1), (2, 1), (2, 2), (3, 2), (4, 3)}


def test_range_join_emits_each_pair_exactly_once(points, intervals):
    # tiny buckets force every interval across many buckets; the
    # point-in-one-bucket construction must still emit no duplicates
    out = range_join(
        points, intervals, point_ts="ts", start_col="start_ts",
        end_col="end_ts", on="key", bucket_width_s=60,
    )
    rows = [(r["pid"], r["win_id"]) for r in out.collect()]
    assert len(rows) == len(set(rows)) == 5


def test_range_join_left_keeps_unmatched_points(points, intervals):
    out = range_join(
        points, intervals, point_ts="ts", start_col="start_ts",
        end_col="end_ts", on="key", bucket_width_s=3600, how="left",
    )
    got = {(r["pid"], r["win_id"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (2, 2), (3, 2), (4, 3), (5, None), (6, None)}


def test_range_join_no_cartesian(points, intervals):
    out = range_join(
        points, intervals, point_ts="ts", start_col="start_ts",
        end_col="end_ts", on="key", bucket_width_s=3600,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_range_join_empty_intervals_match_nothing(spark, points):
    # end ≤ start is a legal-but-empty interval under closed-open
    # semantics; it must vanish BEFORE the bucket explode (a descending
    # F.sequence range there would blow up, not just waste rows)
    iv = spark.createDataFrame(
        [(9, 100, _ts(30), _ts(30)), (10, 100, _ts(500), _ts(20))],
        "win_id long, key long, start_ts timestamp, end_ts timestamp",
    )
    out = range_join(
        points, iv, point_ts="ts", start_col="start_ts",
        end_col="end_ts", on="key", bucket_width_s=3600,
    )
    assert out.count() == 0


def test_range_join_without_keys(spark, intervals):
    # on=None: pure time containment across ALL intervals
    pts = spark.createDataFrame([(7, _ts(50))], "pid long, ts timestamp")
    out = range_join(
        pts, intervals.drop("key"), point_ts="ts", start_col="start_ts",
        end_col="end_ts", bucket_width_s=3600,
    )
    assert {(r["pid"], r["win_id"]) for r in out.collect()} == {(7, 1), (7, 2), (7, 3)}

"""Parquet-directory fallback for the declared Iceberg layouts
(plans/iceberg.py): days(warc_ts) partitioning must PRUNE at planning
time, and bucket(N, component) must feed component-keyed aggregation with
no Exchange. These execute the same partition specs the DSv2 branch
declares, so the layout logic is proven even while the Iceberg runtime
jar is absent (tests/test_iceberg.py covers the gated DSv2 path itself).
"""

import contextlib
import io
import os
from datetime import datetime

import pytest
from pyspark.sql import Row

from auth2wd_spark.plans import iceberg as icb


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _pages(spark):
    from auth2wd_spark.schemas import PAGES

    rows = [
        (
            f"https://x.test/{d}/{i}",
            datetime(2026, 1, d, 10 + i, 0, 0),
            None,
            f"page {d}-{i}",
            "en",
        )
        for d in (1, 2, 3)
        for i in range(4)
    ]
    return spark.createDataFrame(rows, schema=PAGES)


def test_pages_partitioned_layout_prunes(spark, tmp_path):
    path = str(tmp_path / "pages_by_day")
    icb.write_pages_partitioned(_pages(spark), path)

    # one directory per UTC day, Hive-style
    days = sorted(d for d in os.listdir(path) if d.startswith("warc_day="))
    assert days == ["warc_day=2026-01-01", "warc_day=2026-01-02", "warc_day=2026-01-03"]

    recent = icb.read_pages_partitioned(spark, path, since="2026-01-02")
    assert recent.count() == 8

    plan = _plan(recent)
    # the latest-snapshot filter must land in PartitionFilters (planning-time
    # pruning), NOT as a post-scan data filter
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and any("warc_day" in l for l in part_lines)
    pushed_or_data = [
        l for l in plan.splitlines() if "PushedFilters" in l or l.strip().startswith("Filter")
    ]
    assert not any("warc_day" in l for l in pushed_or_data)


def test_pages_partitioned_day_is_utc_not_session_tz(spark, tmp_path):
    """Iceberg's days() transform floors epoch days in UTC; the fallback
    must produce the same directory for the same instant regardless of
    spark.sql.session.timeZone (to_date would shift 00:30 UTC back to the
    previous day under a negative-offset zone)."""
    # created under the default (UTC) session tz: a true 00:30 UTC instant
    df = _pages(spark).limit(0).union(
        spark.createDataFrame(
            [("https://x.test/tz", datetime(2026, 1, 2, 0, 30, 0), None, "p", "en")],
            schema=_pages(spark).schema,
        )
    )
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    path = str(tmp_path / "pages_tz")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        icb.write_pages_partitioned(df, path)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    days = [d for d in os.listdir(path) if d.startswith("warc_day=")]
    assert days == ["warc_day=2026-01-02"]


def test_pages_dispatcher_uses_parquet_fallback_offline(spark, tmp_path):
    if icb.iceberg_available(spark):
        pytest.skip("Iceberg runtime present: dispatcher takes the DSv2 branch")
    path = str(tmp_path / "pages_dispatch")
    icb.write_pages(_pages(spark), path)
    assert icb.read_pages_partitioned(spark, path).count() == 12


def test_outputs_bucketed_component_agg_no_exchange(spark, tmp_path):
    claims = spark.createDataFrame(
        [
            Row(
                component=i % 7,
                prop="P31",
                value=f"Q{i}",
                references=[
                    Row(stated_in="Q54919", src_prop="P214", src_id=str(i))
                ],
            )
            for i in range(100)
        ]
    )
    side = spark.createDataFrame(
        [Row(component=i % 7, lang="en", value=f"name {i}") for i in range(50)]
    )
    tables = {
        "claims": claims,
        "labels": side,
        "aliases": side,
        "descriptions": side,
        "prop_text": side,
        "members": side,
        "components": side,
    }
    ns = "t_layout_ns"
    try:
        icb.write_outputs_bucketed(tables, ns, as_of="2026-02-03")

        stored = spark.table(f"{ns}.claims")
        # sink-side reference expansion applied
        assert stored.selectExpr("references[0].retrieved AS r").first()["r"] == "2026-02-03"

        # bucket(64, component) metadata must satisfy the component-keyed
        # aggregation clustering: no shuffle Exchange anywhere in the plan
        agg = stored.groupBy("component").count()
        assert agg.count() == 7
        plan = _plan(agg)
        assert "Exchange" not in plan

        # same-bucket-count self-join on component: the merge hint keeps AQE
        # from broadcasting the (tiny, test-scale) side, so the pin is on the
        # 100 TB shape — a sort-merge join with NO shuffle exchange, both
        # sides already clustered by their buckets
        j = (
            stored.alias("a")
            .hint("merge")
            .join(spark.table(f"{ns}.claims").alias("b").hint("merge"), "component")
        )
        jplan = _plan(j)
        assert "Exchange hashpartitioning" not in jplan
        assert "SortMergeJoin" in jplan
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {ns} CASCADE")

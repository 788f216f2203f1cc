"""Iceberg code path: real round-trip when the runtime jars are present,
explicit SKIP (never a silent pass) when they are not, and the parquet
fallback contract of write_outputs."""

import os

import pytest
from pyspark.sql import functions as F

from auth2wd_spark.plans import iceberg as ice
from auth2wd_spark.plans.pipeline import write_outputs


def test_capability_check_is_honest(spark):
    """iceberg_available must reflect the actual classpath: when it says
    True the catalog class loads; when False, referencing an iceberg
    catalog table fails — either way the check and reality agree."""
    avail = ice.iceberg_available(spark)
    if avail:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    else:
        with pytest.raises(Exception):
            spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")


def test_iceberg_roundtrip(spark, tmp_path):
    """Runs the REAL writeTo(...).partitionedBy(...) branch when jars are
    present; skips loudly otherwise."""
    if not ice.iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jars not on the classpath")
    cat = ice.configure_catalog(spark, warehouse=str(tmp_path / "wh"))
    pages = spark.createDataFrame(
        [("u1", "2026-01-01 00:00:00", None, "t", "en")],
        "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    ice.write_pages_iceberg(pages, "crawl.pages", catalog=cat)
    back = ice.read_pages_iceberg(spark, "crawl.pages", catalog=cat)
    assert back.count() == 1


def test_write_outputs_reports_fallback(spark, tmp_path):
    """write_outputs returns False (parquet fallback) or True (Iceberg) —
    and the claimed path actually produced readable output."""
    tables = {
        name: spark.createDataFrame(
            [("c1", "x")], "component STRING, v STRING"
        )
        for name in ("labels", "aliases", "descriptions", "prop_text", "members", "components")
    }
    tables["claims"] = spark.createDataFrame(
        [("c1", "P31", "Q5", [])],
        "component STRING, pred STRING, obj_value STRING, "
        "references ARRAY<STRUCT<stated_in STRING, src_prop STRING, src_id STRING>>",
    )
    out = str(tmp_path / "out")
    used_iceberg = write_outputs(tables, out)
    assert used_iceberg == ice.iceberg_available(spark)
    if used_iceberg:
        assert spark.read.table(f"{ice.DEFAULT_CATALOG}.kg.claims").count() == 1
    else:
        assert spark.read.parquet(f"{out}/claims").count() == 1
        assert os.path.isdir(f"{out}/members")

"""Giant-component / hot-entity stress pins (verdict r2 ask #7).

A pathological corpus — one connected component with ~10^5 member rows,
every record carrying the same hot external id — must produce IDENTICAL
merge output with and without `salt_partitions`, and the salted
pre-repartition must actually spread the component across reducers.

The straggler assertion uses rows-per-partition via spark_partition_id()
rather than the UI/status REST API: test sessions run with
spark.ui.enabled=false, and partition row balance is the deterministic
cause of which max-task-time is the noisy symptom.
"""

import pytest
from pyspark.sql import functions as F

from auth2wd_spark.operators.merge import merge_component

N_ROWS = 100_000
N_SALTS = 8


@pytest.fixture(scope="module")
def giant_component(spark):
    """~1e5-row single component: every subject has the hot extid claim
    (all collapse to ONE merged claim) plus a unique claim and a label."""
    base = spark.range(N_ROWS).select(
        F.lit("GIANT").alias("component"),
        F.concat(F.lit("s"), (F.col("id") % 20000).cast("string")).alias("subj"),
        F.col("id").alias("ord"),
        F.lit("claim").alias("kind"),
        F.when(F.col("id") % 2 == 0, F.lit("P214")).otherwise(F.lit("P213")).alias("pred"),
        F.lit("extid").alias("obj_type"),
        # half the rows share ONE hot value; half are unique
        F.when(F.col("id") % 2 == 0, F.lit("hot-viaf-1"))
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("obj_value"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("int").alias("obj_precision"),
        F.lit("normal").alias("rank"),
        F.lit("").alias("qualifiers"),
        F.lit(True).alias("has_ref"),
        F.lit(214).alias("src_property"),
        F.concat(F.lit("id"), F.col("id").cast("string")).alias("src_id"),
        F.concat(F.lit("url://"), F.col("id").cast("string")).alias("src_url"),
        F.lit(None).cast("int").alias("fallback_property"),
        F.lit(None).cast("string").alias("fallback_text"),
    )
    labels = base.limit(1000).withColumn("kind", F.lit("label")).withColumn(
        "obj_lang", F.lit("en")
    )
    return base.unionByName(labels)


def _salted(df):
    salt = F.pmod(F.xxhash64("subj", "ord"), F.lit(N_SALTS))
    return df.repartition(F.col("component"), salt)


def _canon_claims(tables):
    return sorted(
        (r["pred"], r["obj_value"], r["rank"], tuple(r["references"]))
        for r in tables["claims"].collect()
    )


def test_salted_merge_identical_output(spark, giant_component):
    """salt_partitions only drives the repartition; the merge groupBy keys
    are unchanged, so output must be byte-identical."""
    unsalted = merge_component(giant_component.repartition(F.col("component")))
    salted = merge_component(_salted(giant_component))
    assert _canon_claims(unsalted) == _canon_claims(salted)
    # the hot extid collapsed to exactly one claim carrying N_ROWS/2 refs
    hot = [r for r in salted["claims"].collect() if r["obj_value"] == "hot-viaf-1"]
    assert len(hot) == 1
    assert len(hot[0]["references"]) == N_ROWS // 2
    labels = salted["labels"].collect()
    assert len(labels) == 1  # one component, one language → first-wins label


def test_salted_repartition_spreads_giant_component(spark, giant_component):
    """Unsalted repartition(component) concentrates the whole component on
    ONE reducer (the straggler); the salted repartition must cap the
    largest partition well below that."""
    def partition_counts(df):
        rows = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        return [r["count"] for r in rows]

    # AQE's partition coalescing re-merges the salted buckets when their
    # BYTES are tiny (as they are at test scale) — at the 100 TB posture a
    # giant component is GBs per salt bucket and stays spread. Disable
    # coalescing here to observe the reducer layout the salting produces
    # once byte sizes exceed the advisory target.
    conf = giant_component.sparkSession.conf
    old = conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        unsalted = partition_counts(giant_component.repartition(F.col("component")))
        salted = partition_counts(_salted(giant_component))
    finally:
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
    total = N_ROWS + 1000
    assert max(unsalted) == total  # single-reducer straggler, by construction
    # 8 salts → ≥4 non-empty partitions even with hash collisions, and no
    # partition holds more than half the rows
    assert len(salted) >= N_SALTS // 2
    assert max(salted) < total / 2
    assert sum(salted) == total


def test_ref_cap_equivalence_under_cap(spark, giant_component):
    """ref_cap must be a no-op whenever every claim has ≤ cap references —
    the bounded two-stage agg provably keeps the full sorted union then."""
    # unique-obj_value slice: every claim has exactly 1 reference (< cap);
    # deterministic ord filter — limit() without orderBy could pick
    # DIFFERENT rows for the two lazy re-executions below
    uniques = giant_component.filter(
        F.col("obj_value").startswith("u") & (F.col("ord") < 10000)
    )
    unbounded = merge_component(uniques)["claims"]
    capped = merge_component(uniques, ref_cap=10)["claims"]

    def canon(df):
        return sorted(
            (r["pred"], r["obj_value"], tuple(r["references"]), tuple(r["src_urls"]))
            for r in df.collect()
        )

    assert canon(unbounded) == canon(capped)


def test_ref_cap_bounds_hot_claim(spark, giant_component):
    """The hot claim (N_ROWS/2 distinct refs on ONE claim key) must come
    back with exactly cap references — the sort-smallest ones, identical
    to slicing the unbounded union."""
    cap = 25
    capped = merge_component(giant_component, ref_cap=cap)["claims"]
    hot = [r for r in capped.collect() if r["obj_value"] == "hot-viaf-1"]
    assert len(hot) == 1
    assert len(hot[0]["references"]) == cap
    unbounded = merge_component(giant_component)["claims"]
    hot_full = [r for r in unbounded.collect() if r["obj_value"] == "hot-viaf-1"][0]
    assert list(hot[0]["references"]) == sorted(hot_full["references"])[:cap]
    assert list(hot[0]["src_urls"]) == sorted(hot_full["src_urls"])[:cap]

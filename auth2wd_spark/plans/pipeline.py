"""End-to-end batch pipeline orchestration.

pages → route → latest-snapshot → extract → link → CC → merge → sink.

Scale posture (north_rule):
  - routing/filtering is JVM-side regex inside whole-stage codegen;
  - extraction is Arrow-batched mapInPandas, embarrassingly parallel;
  - every linking join broadcasts a single-hit index (or pre-bucketed
    join at index sizes beyond broadcast);
  - CC is iterative label propagation with per-iteration checkpointing;
  - the merge groupBy keys on (component, claim key) — partial
    aggregation absorbs hot components map-side; `salt_partitions`
    optionally pre-repartitions on a salted key to spread a
    pathological hot component across reducers before the final agg;
  - ``as_of`` replaces the reference's Utc::now() (external_importer.rs:364)
    for deterministic P813 reference dates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.cc import assign_components, build_edges, connected_components
from ..operators.extract import extract_pages
from ..operators.linking import link
from ..operators.merge import merge_component


@dataclass
class PipelineConfig:
    as_of: str = "2026-01-01"  # P813 retrieved date (fixed for determinism)
    cc_max_iter: int = 25
    salt_partitions: int = 0  # >0: pre-shuffle hot components across N salts
    # >0: bound the per-claim reference/src_url arrays via the two-stage
    # salted slice agg — the single-claim-KEY skew defense a giant
    # component needs (see merge.merge_claims); None keeps full unions
    ref_cap: int | None = None
    collect_metrics: bool = True  # per-phase wall times in tables["metrics"]
    # opt-in J2 label+extid retry (reference parity is OFF — see
    # ARCHITECTURE.md §3 deviation 7); plumbed through to link()
    label_retry: bool = False


def run_pipeline(
    pages: DataFrame,
    id_to_qid: DataFrame,
    viaf_lookup: DataFrame,
    valid_gnd_ids: DataFrame,
    config: PipelineConfig | None = None,
) -> dict[str, DataFrame]:
    config = config or PipelineConfig()

    from ..session import ship_package

    ship_package(pages.sparkSession)

    import time as _time

    metrics: dict[str, float] = {}

    def _phase(name: str, fn):
        t0 = _time.perf_counter()
        out = fn()
        metrics[name] = round(_time.perf_counter() - t0, 3)
        return out

    # link() fans raw out into ~6 branches (claims / candidates by kind /
    # prop_text / terms) and every downstream action replans the whole
    # lineage — localCheckpoint both materializes (no recompute per
    # branch) and TRUNCATES the logical plan, which otherwise grows deep
    # enough that Catalyst planning time dominates small-batch runs
    raw = _phase("extract_sec", lambda: extract_pages(pages))
    triples = _phase(
        "link_sec",
        lambda: link(
            raw, id_to_qid, viaf_lookup, valid_gnd_ids, label_retry=config.label_retry
        ).localCheckpoint(),
    )

    edges = build_edges(triples)
    labels = _phase(
        "cc_sec", lambda: connected_components(edges, max_iter=config.cc_max_iter)
    )
    with_comp = assign_components(triples, labels)

    if config.salt_partitions > 0:
        # spread giant components over reducers before the merge groupBy;
        # the final agg still combines per (component, claim-key) because the
        # groupBy keys are unchanged — salting only drives the repartition.
        salt = F.pmod(F.xxhash64("subj", "ord"), F.lit(config.salt_partitions))
        with_comp = with_comp.repartition(F.col("component"), salt)

    tables = merge_component(with_comp, ref_cap=config.ref_cap)
    tables["triples"] = triples
    tables["components"] = labels
    if config.collect_metrics:
        tables["metrics"] = metrics
    return tables


def attach_retrieved_date(claims: DataFrame, as_of: str) -> DataFrame:
    """Expand compact references into full Wikibase reference snak groups
    (P248 stated-in, P{src} id, P813 retrieved = as_of) — sink-side only."""
    ref_struct = F.transform(
        "references",
        lambda r: F.struct(
            r["stated_in"].alias("stated_in"),
            r["src_prop"].alias("src_prop"),
            r["src_id"].alias("src_id"),
            F.lit(as_of).alias("retrieved"),
        ),
    )
    return claims.withColumn("references", ref_struct)


def write_outputs(tables: dict[str, DataFrame], out_dir: str, as_of: str = "2026-01-01") -> bool:
    """Partitioned item-table sink.

    When the Iceberg runtime is on the classpath, writes REAL Iceberg
    tables (hadoop catalog at `out_dir`, bucket-partitioned on component —
    see plans/iceberg.py) and returns True; otherwise falls back to the
    plain parquet-directory layout and returns False so callers can surface
    which path ran."""
    from .iceberg import configure_catalog, iceberg_available, write_outputs_iceberg

    spark = tables["claims"].sparkSession
    if iceberg_available(spark):
        catalog = configure_catalog(spark, warehouse=out_dir)
        write_outputs_iceberg(tables, namespace="kg", catalog=catalog, as_of=as_of)
        return True

    claims = attach_retrieved_date(tables["claims"], as_of)
    claims.write.mode("overwrite").parquet(f"{out_dir}/claims")
    for name in ("labels", "aliases", "descriptions", "prop_text", "members", "components"):
        tables[name].write.mode("overwrite").parquet(f"{out_dir}/{name}")
    return False

"""Connected components over the record ↔ external-id graph.

Replaces the reference's sequential fixpoint worklist
(/root/reference/src/combinator.rs:132-180): records that share any
supported external id (or an inferred VIAF id, combinator.rs:137-147)
belong to one cluster. The crawl loop's BFS rounds become iterations of
min-label propagation with pointer jumping (path halving), which converges
in O(log d) rounds; each round is one shuffle on the label table and is
localCheckpoint()ed to cut lineage (SURVEY §3.2).

Hot entities (a celebrity VIAF id in millions of pages) make high-degree
nodes; label propagation handles them in the groupBy(min) — a single
reduce key — and AQE skew-join splitting covers the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..properties import P_VIAF, SUPPORTED_PROPERTIES

EDGE_PROPERTIES = tuple(sorted(set(SUPPORTED_PROPERTIES) | {P_VIAF}))


def build_edges(triples: DataFrame) -> DataFrame:
    """(subj ↔ P{prop}:{id}) edges from non-deprecated external-id claims.

    Mirrors MetaItem::get_external_ids (meta_item.rs:175-182) + the
    parser-availability filter (combinator.rs:53-57): only properties with
    a registered parser (plus P214) can link records into one cluster.
    """
    prop_num = F.regexp_extract("pred", r"^P(\d+)$", 1).cast("int")
    return (
        triples.filter(
            (F.col("kind") == "claim")
            & (F.col("obj_type") == "extid")
            & (F.col("rank") != "deprecated")
        )
        .withColumn("prop_num", prop_num)
        .filter(F.col("prop_num").isin(list(EDGE_PROPERTIES)))
        .select(
            F.col("subj").alias("src"),
            F.concat(F.lit("P"), F.col("prop_num").cast("string"), F.lit(":"), F.col("obj_value")).alias("dst"),
        )
        .distinct()
    )


def connected_components(
    edges: DataFrame, max_iter: int = 25, checkpoint: bool = True
) -> DataFrame:
    """edges (src, dst) → (node, component) with component = min node id.

    Min-label propagation + pointer jumping; converges when no label
    changes. Deterministic: component ids are the lexicographic minimum
    member key, independent of partitioning.
    """
    sym = edges.select("src", "dst").union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.distinct()
    if checkpoint:
        sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iter):
        # propagate: min over own label and neighbors' labels
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(nbr_min)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping: component ← component[component]
        parent = new_labels.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_component")
        )
        new_labels = (
            new_labels.join(parent, new_labels["component"] == parent["p_node"], "left")
            .select(
                "node",
                F.coalesce("p_component", "component").alias("component"),
            )
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels


def assign_components(triples: DataFrame, labels: DataFrame) -> DataFrame:
    """Map each subj to its component id; singletons keep subj as component."""
    lab = labels.select(F.col("node").alias("subj"), "component")
    return triples.join(lab, "subj", "left").withColumn(
        "component", F.coalesce("component", "subj")
    )

"""Output serializations mirroring the reference's sinks.

S19 item JSON (/root/reference/src/meta_item.rs:17-29, main.rs:76-104):
one Wikibase-shaped JSON document per canonical item —
``{"item": {type, labels, descriptions, aliases, claims}, "prop_text"}``.
References expand to the (P248 stated-in, P{src} id, P813 retrieved=as_of)
snak group; P813 uses the pipeline's fixed as_of date instead of
Utc::now() (external_importer.rs:364) for determinism.

S20 N-Triples graph dump (external_importer.rs:236-247, main.rs:106-113):
triples rendered as N-Triples lines.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F


def _claims_json(as_of: str):
    """Build a per-claim JSON struct column (applied pre-aggregation)."""
    qualifiers = F.when(F.col("qualifiers") == "", F.lit("[]")).otherwise(
        F.coalesce(F.col("qualifiers"), F.lit("[]"))
    )
    refs = F.to_json(
        F.transform(
            "references",
            lambda r: F.struct(
                r["stated_in"].alias("P248"),
                r["src_prop"].alias("src_prop"),
                r["src_id"].alias("src_id"),
                F.lit(f"+{as_of}T00:00:00Z").alias("P813"),
            ),
        )
    )
    return F.to_json(
        F.struct(
            F.col("pred").alias("property"),
            F.col("obj_type").alias("type"),
            F.col("obj_value").alias("value"),
            F.col("obj_lang").alias("language"),
            F.col("obj_precision").alias("precision"),
            F.col("rank").alias("rank"),
            qualifiers.alias("qualifiers_json"),
            refs.alias("references_json"),
        )
    )


def items_json(tables: dict[str, DataFrame], as_of: str = "2026-01-01") -> DataFrame:
    """(component, item_json) — the MetaItem serialization per component."""
    claims = (
        tables["claims"]
        .withColumn("claim_json", _claims_json(as_of))
        .groupBy("component")
        .agg(F.array_sort(F.collect_list("claim_json")).alias("claims"))
    )
    labels = tables["labels"].groupBy("component").agg(
        F.map_from_entries(F.array_sort(F.collect_list(F.struct("lang", "label")))).alias("labels")
    )
    descriptions = tables["descriptions"].groupBy("component").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("lang", "description")))
        ).alias("descriptions")
    )
    aliases = (
        tables["aliases"]
        .groupBy("component", "lang")
        .agg(F.array_sort(F.collect_list("alias")).alias("vals"))
        .groupBy("component")
        .agg(F.map_from_entries(F.array_sort(F.collect_list(F.struct("lang", "vals")))).alias("aliases"))
    )
    prop_text = tables["prop_text"].groupBy("component").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("fallback_property").alias("property"),
                    F.col("fallback_text").alias("text"),
                )
            )
        ).alias("prop_text")
    )
    base = tables["members"].select("component").distinct()
    joined = (
        base.join(claims, "component", "left")
        .join(labels, "component", "left")
        .join(descriptions, "component", "left")
        .join(aliases, "component", "left")
        .join(prop_text, "component", "left")
    )
    item = F.to_json(
        F.struct(
            F.struct(
                F.lit("item").alias("type"),
                F.col("labels"),
                F.col("descriptions"),
                F.col("aliases"),
                F.col("claims"),
            ).alias("item"),
            F.col("prop_text"),
        )
    )
    return joined.select("component", item.alias("item_json"))


def ntriples(triples: DataFrame) -> DataFrame:
    """(line) — claims rendered as N-Triples (S20 graph dump)."""
    claims = triples.filter(F.col("kind") == "claim")
    subj = F.concat(F.lit("<https://auth2wd.invalid/record/"), F.col("subj"), F.lit(">"))
    pred = F.concat(F.lit("<http://www.wikidata.org/prop/direct/"), F.col("pred"), F.lit(">"))
    escaped = F.regexp_replace(
        F.regexp_replace(F.col("obj_value"), r"\\", r"\\\\"), '"', r"\\\""
    )
    obj = (
        F.when(
            F.col("obj_type") == "item",
            F.concat(F.lit("<http://www.wikidata.org/entity/"), F.col("obj_value"), F.lit(">")),
        )
        .when(F.col("obj_type") == "url", F.concat(F.lit("<"), F.col("obj_value"), F.lit(">")))
        .when(
            F.col("obj_type") == "monolingual",
            F.concat(F.lit('"'), escaped, F.lit('"@'), F.col("obj_lang")),
        )
        .otherwise(F.concat(F.lit('"'), escaped, F.lit('"')))
    )
    return claims.select(
        F.concat(subj, F.lit(" "), pred, F.lit(" "), obj, F.lit(" .")).alias("line")
    )

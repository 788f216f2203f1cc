"""Canonical merge: one item per component (SURVEY.md §2.4).

Replaces the reference's pairwise HashMap-order ItemMerger loop
(/root/reference/src/combinator.rs:182-199) with a single order-independent
groupBy — fair game because the reference's own order-invariance test only
pins the claim COUNT (combinator.rs:557-583); we make the stronger
guarantee of full determinism via canonical (subj, ord) tie-breaking.

Semantics replicated:
  A1/A3  claims identical iff same main snak AND same qualifiers; duplicate
         references union (never added to external-id claims,
         meta_item.rs:96-136). Our per-source reference is the
         (stated_in, src_property, src_id) struct, so reference union is
         collect_set — identical structs collapse, which is exactly the
         reference_exists shared-external-id-snak rule (meta_item.rs:75-91).
  A8     qualifier match ignored for P225 (meta_item.rs:309).
  A5/A6  fix_dates: per (component, P569/P570) deprecate all normal-rank
         claims below max precision + qualifier P2241=Q42727519
         (meta_item.rs:238-280).
  A11/12 label first-wins per language (deterministic subj/ord order),
         further distinct values → aliases; description first-wins.
  A4     prop_text sort+dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..properties import P_DATE_OF_BIRTH, P_DATE_OF_DEATH, STATED_IN

_DATE_PREDS = (f"P{P_DATE_OF_BIRTH}", f"P{P_DATE_OF_DEATH}")


def _stated_in_expr():
    mapping = F.create_map(
        *[x for prop, qid in STATED_IN.items() for x in (F.lit(prop), F.lit(qid))]
    )
    return mapping[F.col("src_property")]


_CLAIM_KEY = (
    "component",
    "pred",
    "obj_type",
    "obj_value",
    "obj_lang",
    "obj_precision",
    "qual_key",
)


def merge_claims(with_comp: DataFrame, ref_cap: int | None = None) -> DataFrame:
    """component-level claim dedup + reference union + fix_dates.

    `ref_cap` bounds the reference/src_url arrays per merged claim: a hot
    claim inside a giant component (P31=Q5 asserted by every one of a
    million member records) otherwise accumulates a million-element
    collect_set in ONE reducer's aggregation buffer — the one skew the
    salted repartition cannot help, because it is a single claim KEY. The
    capped path aggregates in two stages (per-(key, salt) sorted slice,
    then merge-of-slices and re-slice), so no buffer ever holds more than
    ~cap×salts elements. Deterministic, and provably identical to the
    unbounded result whenever a claim has ≤ cap references: each per-salt
    slice keeps its cap sort-smallest, and the global cap smallest are
    always within the union of per-salt smallest.
    """
    claims = with_comp.filter(F.col("kind") == "claim")

    ref = F.when(
        F.col("has_ref"),
        F.struct(
            _stated_in_expr().alias("stated_in"),
            F.concat(F.lit("P"), F.col("src_property").cast("string")).alias("src_prop"),
            F.col("src_id").alias("src_id"),
        ),
    )

    # P225 merges ignoring qualifiers (ItemMerger properties_ignore_qualifier_match)
    qual_key = F.when(F.col("pred") == "P225", F.lit("")).otherwise(F.col("qualifiers"))

    keyed = claims.withColumn("ref", ref).withColumn("qual_key", qual_key)
    depr = F.max(F.when(F.col("rank") == "deprecated", 1).otherwise(0)).alias("any_depr")

    if ref_cap is None:
        grouped = keyed.groupBy(*_CLAIM_KEY).agg(
            # deterministic representative qualifiers: first by (subj, ord)
            F.min_by("qualifiers", F.struct("subj", "ord")).alias("qualifiers"),
            depr,
            F.array_sort(F.collect_set("ref")).alias("references"),
            F.array_sort(F.collect_set("src_url")).alias("src_urls"),
            F.min(F.struct("subj", "ord")).alias("first_seen"),
        )
    else:
        n_salts = 16
        sliced_refs = F.slice(F.array_sort(F.collect_set("ref")), 1, ref_cap)
        sliced_urls = F.slice(F.array_sort(F.collect_set("src_url")), 1, ref_cap)
        partial = (
            keyed.withColumn(
                "salt", F.pmod(F.xxhash64("subj", "ord"), F.lit(n_salts))
            )
            .groupBy(*_CLAIM_KEY, "salt")
            .agg(
                F.min_by(
                    F.struct(F.col("subj"), F.col("ord"), F.col("qualifiers")),
                    F.struct("subj", "ord"),
                ).alias("qual_p"),
                depr,
                sliced_refs.alias("refs_p"),
                sliced_urls.alias("urls_p"),
                F.min(F.struct("subj", "ord")).alias("first_seen"),
            )
        )
        merge_slices = lambda col: F.slice(  # noqa: E731
            F.array_sort(F.array_distinct(F.flatten(F.collect_list(col)))), 1, ref_cap
        )
        grouped = partial.groupBy(*_CLAIM_KEY).agg(
            # (subj, ord) is unique per row, so struct-min == min_by(subj, ord)
            F.min("qual_p").getField("qualifiers").alias("qualifiers"),
            F.max("any_depr").alias("any_depr"),
            merge_slices("refs_p").alias("references"),
            merge_slices("urls_p").alias("src_urls"),
            F.min("first_seen").alias("first_seen"),
        )

    grouped = grouped.withColumn(
        "rank", F.when(F.col("any_depr") == 1, "deprecated").otherwise("normal")
    ).drop("any_depr", "qual_key")
    return fix_dates(grouped)


def fix_dates(claims: DataFrame) -> DataFrame:
    """A6: deprecate lower-precision P569/P570, qualifier P2241=Q42727519.

    The per-(component, pred) max precision is a hash AGGREGATION joined
    back, not a window: an unbounded window sorts every (component, pred)
    partition on one reducer — a giant hot component becomes a straggler —
    while the agg combines map-side and the join is AQE-planned (skew
    splitting applies). Same semantics: rows in groups with no date claims
    get a null max and the `<` comparison is false.
    """
    is_date = F.col("pred").isin(*_DATE_PREDS) & (F.col("obj_type") == "time")
    maxes = (
        claims.filter(is_date)
        .groupBy("component", "pred")
        .agg(F.max("obj_precision").alias("_max_prec"))
    )
    claims = claims.join(maxes, ["component", "pred"], "left")
    max_prec = F.col("_max_prec")
    demote = is_date & (F.col("rank") == "normal") & (F.col("obj_precision") < max_prec)
    deprecation_qualifier = F.lit('[["P2241", "item", "Q42727519"]]')
    return claims.withColumn(
        "qualifiers",
        F.when(
            demote,
            F.when(
                (F.col("qualifiers") == "") | F.col("qualifiers").isNull(),
                deprecation_qualifier,
            ).otherwise(
                # append to existing qualifier list: strip exactly the final
                # ']' (rtrim would eat the whole ']]' tail of nested arrays
                # and corrupt the JSON)
                F.concat(
                    F.expr("substring(qualifiers, 1, length(qualifiers) - 1)"),
                    F.lit(', ["P2241", "item", "Q42727519"]]'),
                )
            ),
        ).otherwise(F.col("qualifiers")),
    ).withColumn("rank", F.when(demote, "deprecated").otherwise(F.col("rank"))).drop(
        "_max_prec"
    )


def merge_terms(with_comp: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """labels (first per language), aliases (distinct, != label), descriptions.

    First-wins is a ``min_by(value, (subj, ord))`` HASH aggregation, not a
    row_number window: the window sorts every (component, lang) partition
    on one reducer, so a pathological giant component degenerates to a
    single task, while min_by combines map-side and never sorts. The alias
    pool is simply ALL label rows minus the winning label value — identical
    to the old "rank > 1" set because duplicates of the winning value were
    filtered by the != label predicate anyway.
    """
    first = F.min_by("obj_value", F.struct("subj", "ord"))

    label_rows = with_comp.filter(F.col("kind") == "label")
    first_label = (
        label_rows.groupBy("component", "obj_lang")
        .agg(first.alias("label"))
        .select("component", F.col("obj_lang").alias("lang"), "label")
    )
    alias_pool = label_rows.select("component", "obj_lang", "obj_value").unionByName(
        with_comp.filter(F.col("kind") == "alias").select(
            "component", "obj_lang", "obj_value"
        )
    )
    aliases = (
        alias_pool.join(
            first_label.withColumnRenamed("lang", "obj_lang"),
            ["component", "obj_lang"],
            "left",
        )
        .filter(F.col("label").isNull() | (F.col("obj_value") != F.col("label")))
        .select(
            "component",
            F.col("obj_lang").alias("lang"),
            F.col("obj_value").alias("alias"),
        )
        .distinct()
    )
    descriptions = (
        with_comp.filter(F.col("kind") == "description")
        .groupBy("component", "obj_lang")
        .agg(first.alias("description"))
        .select("component", F.col("obj_lang").alias("lang"), "description")
    )
    return first_label, aliases, descriptions


def merge_prop_text(with_comp: DataFrame) -> DataFrame:
    """A4: distinct sorted prop_text per component."""
    return (
        with_comp.filter(F.col("kind") == "prop_text")
        .select("component", "fallback_property", "fallback_text")
        .distinct()
    )


def merge_component(
    with_comp: DataFrame, ref_cap: int | None = None
) -> dict[str, DataFrame]:
    """Full canonicalization: returns the normalized item tables."""
    claims = merge_claims(with_comp, ref_cap=ref_cap)
    labels, aliases, descriptions = merge_terms(with_comp)
    prop_text = merge_prop_text(with_comp)
    members = (
        with_comp.select("component", "subj").distinct()
    )
    return {
        "claims": claims,
        "labels": labels,
        "aliases": aliases,
        "descriptions": descriptions,
        "prop_text": prop_text,
        "members": members,
    }

"""Stateless two-item merge — the `GET /merge` analog (SURVEY.md §3.3).

The reference merges two fully-formed Wikidata items pairwise
(`Combinator::combine`, /root/reference/src/combinator.rs:182-199) and pins
merge-order invariance on the claim count against the golden items
`test_data/item1.json` / `item2.json` (combinator.rs:557-583). This module
exposes the same pure surface on the Spark engine: convert each item's
Wikidata JSON into the engine's triple rows, assign everything one
component, and reuse `merge_component` — so the two-item path and the
web-scale component path share one merge implementation (and the groupBy
merge is order-independent by construction, a strictly stronger guarantee
than the reference's count-only pin).

Claim identity matches `ItemMerger` (meta_item.rs:96-136): same main snak
AND same qualifiers, with P225 ignoring qualifiers (meta_item.rs:309).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TRIPLES
from .merge import merge_component

# Wikidata datatype → engine obj_type (sources/base.py claim vocabulary)
_DATATYPE_MAP = {
    "external-id": "extid",
    "wikibase-item": "item",
    "time": "time",
    "string": "string",
    "url": "string",
    "commonsMedia": "string",
    "monolingualtext": "monolingual",
    "quantity": "quantity",
    "globe-coordinate": "coords",
}


# defaults omitted from the encoded value so the common case stays compact
_DEFAULT_CALENDAR = "http://www.wikidata.org/entity/Q1985727"
_UNITLESS = "1"
# \x1f separates value facets inside one snak encoding; \x1e marks the
# non-value snaktypes — both are control chars that cannot occur in
# Wikidata string values, so encodings never collide with real data
_FACET_SEP = "\x1f"
_SNAKTYPE_MARK = "\x1e"


def _snak_value(snak: dict[str, Any]) -> tuple[str | None, str | None, int | None]:
    """(obj_value, obj_lang, obj_precision) from a Wikidata snak.

    Claim identity must match ItemMerger's full-snak equality
    (meta_item.rs:96-136): somevalue/novalue snaks are distinct claims (not
    dropped), a quantity's unit and a time's calendarmodel participate in
    equality (encoded as extra facets when they differ from the defaults).
    """
    snaktype = snak.get("snaktype")
    if snaktype in ("somevalue", "novalue"):
        return f"{_SNAKTYPE_MARK}{snaktype}", None, None
    if snaktype != "value":
        return None, None, None
    dv = snak.get("datavalue", {})
    v = dv.get("value")
    t = dv.get("type")
    if t == "string":
        return v, None, None
    if t == "wikibase-entityid":
        return v.get("id"), None, None
    if t == "time":
        cal = v.get("calendarmodel", _DEFAULT_CALENDAR)
        suffix = "" if cal == _DEFAULT_CALENDAR else f"{_FACET_SEP}{cal}"
        return f"{v.get('time')}{suffix}", None, int(v.get("precision", 11))
    if t == "monolingualtext":
        return v.get("text"), v.get("language"), None
    if t == "quantity":
        unit = v.get("unit", _UNITLESS)
        suffix = "" if unit == _UNITLESS else f"{_FACET_SEP}{unit}"
        return f"{v.get('amount')}{suffix}", None, None
    if t == "globecoordinate":
        return f"{v.get('latitude')}/{v.get('longitude')}", None, None
    return json.dumps(v, sort_keys=True), None, None


def _qualifiers_json(claim: dict[str, Any]) -> str:
    """Engine qualifier encoding: sorted JSON array of [prop, type, value]."""
    quals = []
    for prop, snaks in claim.get("qualifiers", {}).items():
        for snak in snaks:
            value, _lang, _prec = _snak_value(snak)
            obj_type = _DATATYPE_MAP.get(snak.get("datatype", "string"), "string")
            quals.append([prop, obj_type, value])
    if not quals:
        return ""
    # None-safe ordering: somevalue/novalue qualifiers now encode as marked
    # strings (distinct in qualifier identity, per ItemMerger full-snak
    # equality); only UNKNOWN snaktypes still yield None, which is
    # unorderable against strings under a plain sort
    quals.sort(key=lambda q: (q[0], q[1], q[2] is None, q[2] or ""))
    return json.dumps(quals, separators=(", ", ": "))


def item_to_triples(spark: SparkSession, item: dict[str, Any]) -> DataFrame:
    """Wikidata item JSON → engine triple rows (claims + terms)."""
    subj = item["id"]
    rows: list[dict[str, Any]] = []
    ord_ = 0

    def base_row(kind: str) -> dict[str, Any]:
        nonlocal ord_
        ord_ += 1
        return {
            "subj": subj,
            "kind": kind,
            "has_ref": False,
            "ord": ord_,
            "src_url": f"item://{subj}",
        }

    for prop in sorted(item.get("claims", {})):
        for claim in item["claims"][prop]:
            snak = claim.get("mainsnak", {})
            value, lang, prec = _snak_value(snak)
            if value is None:
                continue
            row = base_row("claim")
            row.update(
                pred=prop,
                obj_type=_DATATYPE_MAP.get(snak.get("datatype", "string"), "string"),
                obj_value=value,
                obj_lang=lang,
                obj_precision=prec,
                rank=claim.get("rank", "normal"),
                qualifiers=_qualifiers_json(claim),
                has_ref=bool(claim.get("references")),
            )
            rows.append(row)

    for lang in sorted(item.get("labels", {})):
        row = base_row("label")
        row.update(obj_lang=lang, obj_value=item["labels"][lang]["value"])
        rows.append(row)
    for lang in sorted(item.get("aliases", {})):
        for alias in item["aliases"][lang]:
            row = base_row("alias")
            row.update(obj_lang=lang, obj_value=alias["value"])
            rows.append(row)
    for lang in sorted(item.get("descriptions", {})):
        row = base_row("description")
        row.update(obj_lang=lang, obj_value=item["descriptions"][lang]["value"])
        rows.append(row)

    return spark.createDataFrame(rows, TRIPLES)


def merge_items(
    spark: SparkSession, base: dict[str, Any], *others: dict[str, Any]
) -> dict[str, DataFrame]:
    """Merge fully-formed items into one: the stateless two-item surface.

    Returns the normalized item tables (`claims`, `labels`, `aliases`,
    `descriptions`, `members`, ...) keyed by component = the base item's
    id. Order-independent on claims: `merge_items(a, b)` and
    `merge_items(b, a)` yield identical claim sets. First-wins terms
    follow the BASE item (the reference's base-item rule): merge_terms
    orders by subject, so each item's subject key is prefixed with its
    argument position (base = 0000) for the merge and stripped from the
    published members table."""
    from pyspark.sql import functions as F

    _SUBJ_SEP = "\x1f"
    triples = None
    for i, item in enumerate([base, *others]):
        t = item_to_triples(spark, item).withColumn(
            "subj", F.concat(F.lit(f"{i:04d}{_SUBJ_SEP}"), F.col("subj"))
        )
        triples = t if triples is None else triples.unionByName(t)
    # one component, canonical id = base item's id
    with_comp = triples.withColumn("component", F.lit(base["id"]))
    tables = merge_component(with_comp)
    tables["members"] = (
        tables["members"]
        .withColumn("subj", F.element_at(F.split("subj", _SUBJ_SEP), 2))
        .distinct()  # self-merge: the same id under two tags is one member
    )
    # the argument-position prefix is merge-internal ordering state; strip it
    # from every published surface (first_seen is consumed by sinks/diffs)
    tables["claims"] = _publish_claims(
        tables["claims"].withColumn(
            "first_seen",
            F.struct(
                F.element_at(F.split(F.col("first_seen.subj"), _SUBJ_SEP), 2).alias("subj"),
                F.col("first_seen.ord").alias("ord"),
            ),
        )
    )
    return tables


def _publish_claims(claims: DataFrame) -> DataFrame:
    """Decode the merge-internal snak-identity encoding for publication.

    Claim IDENTITY (the merge groupBy key) uses \\x1f-faceted obj_values
    (quantity unit, time calendarmodel) and \\x1e-marked snaktypes so that
    full-snak equality matches ItemMerger — but control-char encodings must
    not leak to consumers. Published shape: a `snaktype` column
    (value/somevalue/novalue; obj_value NULL for the non-value kinds) and
    the facet split into `obj_unit` / `obj_calendar` (NULL at the
    defaults). Distinct internal keys stay distinct rows — e.g. same-amount
    different-unit quantities publish as two rows with equal obj_value but
    different obj_unit."""
    from pyspark.sql import functions as F

    is_marked = F.col("obj_value").startswith(_SNAKTYPE_MARK)
    parts = F.split(F.col("obj_value"), _FACET_SEP)
    has_facet = F.size(parts) > 1
    facet = F.when(has_facet & ~is_marked, F.element_at(parts, 2))
    return (
        claims.withColumn(
            "snaktype",
            F.when(is_marked, F.substring(F.col("obj_value"), 2, 100)).otherwise(
                F.lit("value")
            ),
        )
        .withColumn("obj_unit", F.when(F.col("obj_type") == "quantity", facet))
        .withColumn("obj_calendar", F.when(F.col("obj_type") == "time", facet))
        .withColumn(
            "obj_value",
            F.when(is_marked, F.lit(None).cast("string")).otherwise(
                F.element_at(parts, 1)
            ),
        )
        # qualifier values carry the same marks inside their JSON encoding —
        # as the ESCAPED 6-char backslash-u001e / backslash-u001f forms, / , because
        # json.dumps escapes control chars. Publish them readably (identity
        # was already resolved on the encoded form above).
        .withColumn(
            "qualifiers",
            F.regexp_replace(
                F.regexp_replace("qualifiers", r"\\u001e", "snaktype="),
                r"\\u001f",
                "|",
            ),
        )
    )

"""pages → raw triples: JVM-side routing + vectorized parse UDF.

Routing (url → source, record id) compiles the registry's regex table into
a single JVM-side CASE/regexp_extract expression so noise pages are
filtered inside whole-stage codegen before any Python is involved —
the Catalyst analog of the reference's parser-availability filter
(/root/reference/src/combinator.rs:66-70).

Parsing runs in ``mapInPandas`` (Arrow batches); one small in-memory graph
per record, never a cluster-wide structure (SURVEY.md §1.1).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.extid import subj_key
from ..schemas import RAW
from ..sources.registry import PARSERS, ROUTES


def route(pages: DataFrame) -> DataFrame:
    """Tag each page with (source, record_id); unroutable pages drop out.

    Two-step on purpose: the `source` CASE chain is the only expression
    that runs over every (mostly noise) page; id extraction keys off the
    already-computed `source` column and therefore runs one regex on the
    tiny routed fraction instead of re-matching the whole table.
    """
    source_expr = F.lit(None).cast("string")
    # build right-to-left so the FIRST route wins (first-match semantics)
    for source, pattern in reversed(ROUTES):
        cond = F.regexp_like(F.col("url"), F.lit(pattern))
        source_expr = F.when(cond, F.lit(source)).otherwise(source_expr)
    routed = pages.withColumn("source", source_expr).filter(F.col("source").isNotNull())

    id_expr = F.lit(None).cast("string")
    for source, pattern in reversed(ROUTES):
        id_expr = F.when(
            F.col("source") == source, F.regexp_extract(F.col("url"), pattern, 1)
        ).otherwise(id_expr)
    return routed.withColumn("record_id", id_expr)


def latest_snapshot(routed: DataFrame) -> DataFrame:
    """One row per (source, record_id): the latest crawl snapshot wins.

    max_by keeps this a single hash aggregation (partial map-side combine),
    no window/sort — the cheap way to fold re-crawls at 100 TB.
    """
    return (
        routed.groupBy("source", "record_id")
        .agg(
            F.max_by(F.struct("url", "text", "lang"), "warc_ts").alias("s"),
            F.max("warc_ts").alias("warc_ts"),
        )
        .select("source", "record_id", "s.url", "s.text", "s.lang", "warc_ts")
    )


def attach_secondary_bodies(records: DataFrame) -> DataFrame:
    """Join two-page sources (GBIF species + occurrence images) on record id.

    The images side is a small filtered slice → broadcast-joined; primary
    records pass through untouched (SURVEY §2.1 S16).
    """
    extra = (
        records.filter(F.col("source") == "gbif_images")
        .select(
            F.col("record_id").alias("x_record_id"),
            F.col("text").alias("extra_text"),
        )
    )
    primary = records.filter(F.col("source") != "gbif_images")
    return primary.join(
        F.broadcast(extra),
        (primary["source"] == "gbif") & (primary["record_id"] == extra["x_record_id"]),
        "left",
    ).drop("x_record_id")


_EMPTY = {f.name: None for f in RAW.fields}


def _record_rows(source: str, record_id: str, url: str, text: str, extra: str | None) -> list[dict]:
    parser = PARSERS.get(source)
    if parser is None or text is None:
        return []
    try:
        eff_id, b = parser.parse(record_id, text, extra)
    except Exception:
        return []
    subj = subj_key(parser.property, eff_id)
    rescues = source not in ("worldcat", "inaturalist", "ncbi", "gbif", "pubchem")
    out = []
    for r in b.rows:
        row = dict(_EMPTY)
        row.update(
            subj=subj,
            kind=r["kind"],
            src_property=parser.property,
            src_id=eff_id,
            src_url=url,
            ord=r["ord"],
        )
        kind = r["kind"]
        if kind == "claim":
            quals = r["qualifiers"]
            row.update(
                pred=r["pred"],
                obj_type=r["obj_type"],
                obj_value=r["obj_value"],
                obj_lang=r["obj_lang"],
                obj_precision=r["obj_precision"],
                rank=r["rank"],
                qualifiers=json.dumps([list(q) for q in quals]) if quals else "",
                has_ref=bool(r["has_ref"]),
                needs_gnd_check=bool(r.get("needs_gnd_check")),
            )
        elif kind == "candidate":
            fb = r.get("fallback_text")
            if fb is not None:
                from ..functions.extid import do_not_use_external_url

                if do_not_use_external_url(fb):
                    fb = None  # denylisted fallback never becomes prop_text
            row.update(
                pred=r["pred"],
                cand_kind=r["cand_kind"],
                cand_property=r["cand_property"],
                cand_id=r["cand_id"],
                fallback_property=r.get("fallback_property"),
                fallback_text=fb,
                has_ref=bool(r["has_ref"]),
                qualifiers="",
            )
        elif kind == "prop_text":
            row.update(
                fallback_property=r["fallback_property"],
                fallback_text=r["fallback_text"],
                rescue=rescues,
                # a later rescue claim inherits the parser's per-property
                # reference policy (e.g. GND never references P27)
                has_ref=parser.ref_for_property(r["fallback_property"]),
            )
        else:  # label | alias | description
            row.update(obj_lang=r["obj_lang"], obj_value=r["obj_value"])
        out.append(row)
    return out


def extract(records: DataFrame) -> DataFrame:
    """records (source, record_id, url, text[, extra_text]) → RAW triples."""
    if "extra_text" not in records.columns:
        records = records.withColumn("extra_text", F.lit(None).cast("string"))
    cols = ["source", "record_id", "url", "text", "extra_text"]

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in RAW.fields]
        for pdf in batches:
            rows: list[dict] = []
            for source, record_id, url, text, extra in zip(
                pdf["source"], pdf["record_id"], pdf["url"], pdf["text"], pdf["extra_text"]
            ):
                rows.extend(_record_rows(source, record_id, url, text, extra))
            yield pd.DataFrame(rows, columns=names)

    return records.select(*cols).mapInPandas(parse_batches, schema=RAW)


def extract_pages(pages: DataFrame) -> DataFrame:
    """Full pages → RAW chain: route → latest snapshot → pair → parse."""
    return extract(attach_secondary_bodies(latest_snapshot(route(pages))))

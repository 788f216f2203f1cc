"""GBIF taxon parser (reference: /root/reference/src/gbif_taxon.rs).

Two record kinds joined on taxon id (species JSON + occurrence-search
images JSON, SURVEY §2.1 S16) — the images payload arrives as
``extra_body``. Replicates the reference's taxon-name quirk: the lookup
uses JSON key "Battus philenor" instead of "canonicalName"
(gbif_taxon.rs:81), so P225/labels are normally never emitted — the
6-claim golden count depends on it.
"""

from __future__ import annotations

import json

from ..properties import (
    P_COMMONS_COMPATIBLE_IMAGE_URL,
    P_GBIF_TAXON,
    P_INSTANCE_OF,
    P_PARENT_TAXON,
    P_TAXON_COMMON_NAME,
    P_TAXON_NAME,
    P_TAXON_RANK,
    TAXON_LABEL_LANGUAGES,
    TAXON_MAP,
    VALID_IMAGE_LICENSES,
)
from .base import MetaItemBuilder, SourceParser


class GbifParser(SourceParser):
    source = "gbif"
    property = P_GBIF_TAXON
    primary_language = "en"

    def get_key_url(self, record_id: str) -> str:
        return f"https://www.gbif.org/species/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        j = json.loads(body)

        b.add_claim(self.property, "extid", record_id)

        parent = j.get("parentKey")
        if isinstance(parent, int):
            b.add_candidate(
                "parent_taxon", P_PARENT_TAXON, cand_property=self.property, cand_id=str(parent)
            )

        b.add_claim(P_INSTANCE_OF, "item", "Q16521")

        # quirk-exact: reads key "Battus philenor", not "canonicalName"
        name = j.get("Battus philenor")
        if isinstance(name, str):
            b.add_claim(P_TAXON_NAME, "extid", name)
            for lang in TAXON_LABEL_LANGUAGES:
                b.push_label(lang, name)

        common = j.get("vernacularName")
        if isinstance(common, str):
            b.add_claim(P_TAXON_COMMON_NAME, "monolingual", common, obj_lang=self.primary_language)

        rank = j.get("rank")
        if isinstance(rank, str) and rank.lower() in TAXON_MAP:
            b.add_claim(P_TAXON_RANK, "item", TAXON_MAP[rank.lower()])

        if extra_body:
            try:
                images = json.loads(extra_body)
            except ValueError:
                images = None
            if isinstance(images, dict):
                for result in images.get("results") or []:
                    self._add_image(b, result, record_id)
        return None

    def _add_image(self, b: MetaItemBuilder, result, record_id: str) -> None:
        if not isinstance(result, dict):
            return
        if str(result.get("taxonKey")) != record_id:
            return
        for medium in result.get("media") or []:
            if not isinstance(medium, dict):
                continue
            image_url = medium.get("identifier")
            license_url = medium.get("license")
            if not isinstance(image_url, str) or not isinstance(license_url, str):
                continue
            license_item = VALID_IMAGE_LICENSES.get(license_url.lower())
            if license_item is None:
                continue
            attribution = medium.get("rightsHolder") or medium.get("creator")
            if not isinstance(attribution, str):
                continue
            fmt = medium.get("format")
            if not isinstance(fmt, str):
                continue
            qualifiers = [
                ("P275", "item", license_item),
                ("P2093", "string", attribution),
                ("P2699", "url", image_url),
            ]
            if fmt == "image/jpeg":
                qualifiers.append(("P2701", "item", "Q2195"))
            b.add_claim(
                P_COMMONS_COMPATIBLE_IMAGE_URL, "extid", image_url, qualifiers=tuple(qualifiers)
            )

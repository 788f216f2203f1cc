"""iNaturalist taxon parser (reference: /root/reference/src/inaturalist.rs).

Extracts the ``taxon: {...}.results[0]`` JS payload embedded in the taxon
HTML page (inaturalist.rs:16-17,72-80), then emits taxon facts: parent
taxon (deferred class-constrained lookup), commons-compatible images with
license/attribution qualifiers, P31 (extinct → Q98961713), taxon name +
six-language labels, rank, common name, IUCN conservation status.
"""

from __future__ import annotations

import json
import re

from ..properties import (
    IUCN_REDLIST,
    P_COMMONS_COMPATIBLE_IMAGE_URL,
    P_INATURALIST_TAXON,
    P_INSTANCE_OF,
    P_IUCN_CONSERVATION_STATUS,
    P_IUCN_TAXON_ID,
    P_PARENT_TAXON,
    P_TAXON_COMMON_NAME,
    P_TAXON_NAME,
    P_TAXON_RANK,
    TAXON_LABEL_LANGUAGES,
    TAXON_MAP,
    VALID_IMAGE_LICENSES,
)
from .base import MetaItemBuilder, SourceParser

RE_SERVER_PAYLOAD = re.compile(r" *taxon: (\{.+)\.results\[0\]")
RE_IUCN_REDLIST_URL = re.compile(r"https://www.iucnredlist.org/species/(\d+)/\d+")


class InaturalistParser(SourceParser):
    source = "inaturalist"
    property = P_INATURALIST_TAXON
    primary_language = "en"

    def get_key_url(self, record_id: str) -> str:
        return f"https://www.inaturalist.org/taxa/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        m = RE_SERVER_PAYLOAD.search(body)
        if not m:
            raise ValueError("No JSON found")
        j = json.loads(m.group(1))
        results = j.get("results") or []
        if not results or not isinstance(results[0], dict):
            raise ValueError("No JSON found")
        taxon = results[0]

        b.add_claim(self.property, "extid", record_id)

        parent_id = taxon.get("parent_id")
        if isinstance(parent_id, int):
            b.add_candidate(
                "parent_taxon",
                P_PARENT_TAXON,
                cand_property=self.property,
                cand_id=str(parent_id),
            )

        default_photo = taxon.get("default_photo")
        if isinstance(default_photo, dict):
            self._add_image(b, default_photo)
        for tp in taxon.get("taxon_photos") or []:
            photo = tp.get("photo") if isinstance(tp, dict) else None
            if isinstance(photo, dict):
                self._add_image(b, photo)

        if isinstance(taxon.get("extinct"), bool):
            b.add_claim(P_INSTANCE_OF, "item", "Q98961713" if taxon["extinct"] else "Q16521")

        name = taxon.get("name")
        if isinstance(name, str):
            b.add_claim(P_TAXON_NAME, "extid", name)
            for lang in TAXON_LABEL_LANGUAGES:
                b.push_label(lang, name)

        rank = taxon.get("rank")
        if isinstance(rank, str) and rank.lower() in TAXON_MAP:
            b.add_claim(P_TAXON_RANK, "item", TAXON_MAP[rank.lower()])

        common = taxon.get("preferred_common_name") or taxon.get("english_common_name")
        if isinstance(common, str):
            b.add_claim(
                P_TAXON_COMMON_NAME, "monolingual", common, obj_lang=self.primary_language
            )

        for cs in taxon.get("conservation_statuses") or []:
            self._add_conservation_status(b, cs)
        return None

    def _add_image(self, b: MetaItemBuilder, photo: dict) -> None:
        license_code = photo.get("license_code")
        if not isinstance(license_code, str):
            return
        license_item = VALID_IMAGE_LICENSES.get(license_code.lower())
        if license_item is None:
            return
        image_url = photo.get("original_url") or photo.get("large_url") or photo.get("medium_url")
        attribution = photo.get("attribution")
        if not isinstance(image_url, str) or not isinstance(attribution, str):
            return
        qualifiers = [
            ("P275", "item", license_item),
            ("P2093", "string", attribution),
            ("P2699", "url", image_url),
        ]
        if image_url.endswith(("jpg", "jpeg")):
            qualifiers.append(("P2701", "item", "Q2195"))
        b.add_claim(
            P_COMMONS_COMPATIBLE_IMAGE_URL, "extid", image_url, qualifiers=tuple(qualifiers)
        )

    def _add_conservation_status(self, b: MetaItemBuilder, cs) -> None:
        if not isinstance(cs, dict):
            return
        status = cs.get("status")
        authority = cs.get("authority")
        if not isinstance(status, str) or authority != "IUCN Red List":
            return
        url = cs.get("url") or ""
        m = RE_IUCN_REDLIST_URL.search(url) if isinstance(url, str) else None
        if m:
            b.add_claim(P_IUCN_TAXON_ID, "extid", m.group(1))
        item = IUCN_REDLIST.get(status.lower())
        if item is not None:
            b.add_claim(P_IUCN_CONSERVATION_STATUS, "item", item)

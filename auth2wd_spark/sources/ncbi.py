"""NCBI taxonomy parser (reference: /root/reference/src/ncbi_taxonomy.rs).

Reads the eutils efetch XML (TaxaSet/Taxon): own id, parent taxon
(deferred lookup), P31=Q16521, scientific name + six-language labels,
rank.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..properties import (
    P_INSTANCE_OF,
    P_NCBI_TAXONOMY,
    P_PARENT_TAXON,
    P_TAXON_NAME,
    P_TAXON_RANK,
    TAXON_LABEL_LANGUAGES,
    TAXON_MAP,
)
from .base import MetaItemBuilder, SourceParser


class NcbiParser(SourceParser):
    source = "ncbi"
    property = P_NCBI_TAXONOMY
    primary_language = "en"

    def get_key_url(self, record_id: str) -> str:
        return f"https://www.ncbi.nlm.nih.gov/Taxonomy/Browser/wwwtax.cgi?mode=Info&id={record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        root = ET.fromstring(body)
        taxon = root.find("Taxon")
        if taxon is None:
            raise ValueError("Invalid XML")

        b.add_claim(self.property, "extid", record_id)

        parent = taxon.findtext("ParentTaxId")
        if parent:
            b.add_candidate(
                "parent_taxon", P_PARENT_TAXON, cand_property=self.property, cand_id=parent
            )

        b.add_claim(P_INSTANCE_OF, "item", "Q16521")

        name = taxon.findtext("ScientificName")
        if name:
            b.add_claim(P_TAXON_NAME, "extid", name)
            for lang in TAXON_LABEL_LANGUAGES:
                b.push_label(lang, name)

        rank = taxon.findtext("Rank")
        if rank and rank.lower() in TAXON_MAP:
            b.add_claim(P_TAXON_RANK, "item", TAXON_MAP[rank.lower()])
        return None

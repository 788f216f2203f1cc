"""SELIBR (National Library of Sweden) parser (reference: /root/reference/src/selibr.rs).

The record's main key is resolved via a reverse ``sameAs`` lookup from
``http://libris.kb.se/auth/{id}`` (selibr.rs:78-85); parsing fails when no
key is found.
"""

from __future__ import annotations

from ..functions.rdfxml import Graph
from ..properties import P_COUNTRY_OF_CITIZENSHIP, P_SELIBR
from .base import MetaItemBuilder, SourceParser


class SelibrParser(SourceParser):
    source = "selibr"
    property = P_SELIBR
    primary_language = "sv"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:  # key resolved per record
        return f"http://libris.kb.se/resource/auth/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        g = Graph.from_rdfxml(body)
        keys = g.property_object_iris(
            "https://id.kb.se/vocab/sameAs", f"http://libris.kb.se/auth/{record_id}"
        )
        if not keys:
            raise ValueError(f"could not find main key for '{record_id}'")
        id_url = f"{keys[0]}#it"
        self.add_the_usual(b, g, record_id, id_url)
        for url in g.subject_iris(id_url, "https://id.kb.se/vocab/nationality"):
            b.add_prop_text(P_COUNTRY_OF_CITIZENSHIP, url)
        return None

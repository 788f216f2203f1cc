"""NDL (National Diet Library) parser (reference: /root/reference/src/ndl.rs)."""

from __future__ import annotations

from ..functions.rdfxml import Graph
from ..properties import P_DATE_OF_BIRTH, P_DATE_OF_DEATH, P_NDL
from .base import MetaItemBuilder, SourceParser


class NdlParser(SourceParser):
    source = "ndl"
    property = P_NDL
    primary_language = "ja"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:
        return f"http://id.ndl.go.jp/auth/entity/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        g = Graph.from_rdfxml(body)
        id_url = self.get_key_url(record_id)
        self.add_the_usual(b, g, record_id, id_url)
        for iri, prop in (
            ("http://RDVocab.info/ElementsGr2/dateOfBirth", P_DATE_OF_BIRTH),
            ("http://RDVocab.info/ElementsGr2/dateOfDeath", P_DATE_OF_DEATH),
        ):
            self.add_date_claims(b, g.subject_literals(id_url, iri), prop)
        return None

"""BNE (Biblioteca Nacional de España) parser (reference: /root/reference/src/bne.rs)."""

from __future__ import annotations

from ..functions.rdfxml import Graph
from ..properties import P_BNE, P_COUNTRY_OF_CITIZENSHIP, P_DATE_OF_BIRTH, P_DATE_OF_DEATH
from .base import MetaItemBuilder, SourceParser


class BneParser(SourceParser):
    source = "bne"
    property = P_BNE
    primary_language = "es"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:
        return f"https://datos.bne.es/resource/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        g = Graph.from_rdfxml(body)
        id_url = self.get_key_url(record_id)
        self.add_the_usual(b, g, record_id, id_url)

        # nationality literals: same IRI the usual chain parks as P1412 —
        # the reference adds BOTH prop_texts (bne.rs:53-55 + add_language)
        for text in g.subject_literals(id_url, "http://www.rdaregistry.info/Elements/a/P50102"):
            b.add_prop_text(P_COUNTRY_OF_CITIZENSHIP, text)

        for iri, prop in (
            ("https://datos.bne.es/def/P5010", P_DATE_OF_BIRTH),
            ("https://datos.bne.es/def/P5011", P_DATE_OF_DEATH),
        ):
            self.add_date_claims(b, g.subject_literals(id_url, iri), prop)
        return None

"""ULAN (Getty) parser (reference: /root/reference/src/ulan.rs).

Adds unconditional P31=Q5, plus children (ulan1512_parent_of → P40) and
mentors (ulan1102_student_of → P1066) via deferred ULAN-id lookups.
"""

from __future__ import annotations

from ..functions.rdfxml import Graph
from ..properties import P_CHILD, P_INSTANCE_OF, P_STUDENT_OF, P_ULAN
from .base import MetaItemBuilder, SourceParser


class UlanParser(SourceParser):
    source = "ulan"
    property = P_ULAN
    primary_language = "en"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:
        return f"http://vocab.getty.edu/ulan/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        g = Graph.from_rdfxml(body)
        id_url = self.get_key_url(record_id)
        self.add_the_usual(b, g, record_id, id_url)
        b.add_claim(P_INSTANCE_OF, "item", "Q5")
        for iri, prop in (
            ("http://vocab.getty.edu/ontology#ulan1512_parent_of", P_CHILD),
            ("http://vocab.getty.edu/ontology#ulan1102_student_of", P_STUDENT_OF),
        ):
            for url in g.subject_iris(id_url, iri):
                ulan_id = url.rsplit("/", 1)[-1]
                if ulan_id:
                    b.add_candidate(
                        "extid",
                        prop,
                        cand_property=P_ULAN,
                        cand_id=ulan_id,
                        fallback_property=prop,
                        fallback_text=url,
                    )
                else:
                    b.add_prop_text(prop, url)
        return None

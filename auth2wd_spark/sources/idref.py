"""IdRef/SUDOC parser (reference: /root/reference/src/id_ref.rs).

The record's main subject is ``http://www.idref.fr/{id}/id``; birth/death
dates hang off sibling subjects ``.../{id}/birth`` and ``.../{id}/death``.
No label transform (IdRef labels are already "First Last").
"""

from __future__ import annotations

from ..functions.extid import url2external_id
from ..functions.rdfxml import Graph
from ..properties import P_COUNTRY_OF_CITIZENSHIP, P_DATE_OF_BIRTH, P_DATE_OF_DEATH, P_IDREF
from .base import MetaItemBuilder, SourceParser


class IdrefParser(SourceParser):
    source = "idref"
    property = P_IDREF
    primary_language = "fr"
    transforms_label = False

    def get_key_url(self, record_id: str, key: str = "id") -> str:
        return f"http://www.idref.fr/{record_id}/{key}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        g = Graph.from_rdfxml(body)
        id_url = self.get_key_url(record_id)
        self.add_the_usual(b, g, record_id, id_url)

        for url in g.subject_iris(id_url, "http://dbpedia.org/ontology/citizenship"):
            extid = url2external_id(url)
            if extid is not None:
                b.add_candidate(
                    "extid",
                    P_COUNTRY_OF_CITIZENSHIP,
                    cand_property=extid[0],
                    cand_id=extid[1],
                    fallback_property=P_COUNTRY_OF_CITIZENSHIP,
                    fallback_text=url,
                )
            else:
                b.add_prop_text(P_COUNTRY_OF_CITIZENSHIP, url)

        for key, prop in (("birth", P_DATE_OF_BIRTH), ("death", P_DATE_OF_DEATH)):
            self.add_date_claims(
                b,
                g.subject_literals(self.get_key_url(record_id, key), "http://purl.org/vocab/bio/0.1/date"),
                prop,
            )
        return None

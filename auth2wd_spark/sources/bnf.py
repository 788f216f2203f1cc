"""BnF parser (reference: /root/reference/src/bnf.rs).

ID validated by ``^(\\d{8,9})[0-9bcdfghjkmnpqrstvwxz]$`` (bnf.rs:14-15);
dates come both as rdvocab IRIs (date URLs) and vocab.org literals;
birth/death places are parked as prop_text.
"""

from __future__ import annotations

import re

from ..functions.rdfxml import Graph
from ..properties import (
    P_BNF,
    P_DATE_OF_BIRTH,
    P_DATE_OF_DEATH,
    P_PLACE_OF_BIRTH,
    P_PLACE_OF_DEATH,
)
from .base import MetaItemBuilder, SourceParser

RE_NUMERIC_ID = re.compile(r"^(\d{8,9})[0-9bcdfghjkmnpqrstvwxz]$")


class BnfParser(SourceParser):
    source = "bnf"
    property = P_BNF
    primary_language = "fr"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:
        return f"https://data.bnf.fr/ark:/12148/cb{record_id}#about"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        if not RE_NUMERIC_ID.match(record_id):
            raise ValueError(f"ID format error for '{record_id}'")
        g = Graph.from_rdfxml(body)
        id_url = self.get_key_url(record_id)
        self.add_the_usual(b, g, record_id, id_url)

        for iri, prop in (
            ("http://rdvocab.info/ElementsGr2/dateOfBirth", P_DATE_OF_BIRTH),
            ("http://rdvocab.info/ElementsGr2/dateOfDeath", P_DATE_OF_DEATH),
        ):
            self.add_date_claims(b, g.subject_iris(id_url, iri), prop)
        for iri, prop in (
            ("http://vocab.org/bio/0.1/birth", P_DATE_OF_BIRTH),
            ("http://vocab.org/bio/0.1/death", P_DATE_OF_DEATH),
        ):
            self.add_date_claims(b, g.subject_literals(id_url, iri), prop)
        for iri, prop in (
            ("http://rdvocab.info/ElementsGr2/placeOfBirth", P_PLACE_OF_BIRTH),
            ("http://rdvocab.info/ElementsGr2/placeOfDeath", P_PLACE_OF_DEATH),
        ):
            for s in g.subject_literals(id_url, iri):
                b.add_prop_text(prop, s)
        return None

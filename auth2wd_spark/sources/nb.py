"""NB (Nationale Thesaurus voor Auteurs) parser
(reference: /root/reference/src/nb.rs).

Input is a JSON array of {0: s, 1: p, 2: o} term triples; only triples
about the record's own subject are read. sameAs external ids are claimed
directly — no denylist, no GND validity check (nb.rs:137-143).
"""

from __future__ import annotations

import json

from ..functions.dates import parse_date
from ..functions.extid import url2external_id
from ..properties import (
    P_COUNTRY_OF_CITIZENSHIP,
    P_DATE_OF_BIRTH,
    P_DATE_OF_DEATH,
    P_INSTANCE_OF,
    P_NB,
)
from .base import MetaItemBuilder, SourceParser


class NbParser(SourceParser):
    source = "nb"
    property = P_NB
    primary_language = "nl"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:
        return f"http://data.bibliotheken.nl/id/thes/p{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        data = json.loads(body)
        own_url = self.get_key_url(record_id)
        # the usual on an empty graph → own id + try_viaf (P1006 unmapped → no-op)
        b.add_claim(self.property, "extid", record_id)
        self.try_viaf(b, record_id)

        for triple in data:
            # payloads serialize {0:s,1:p,2:o} either as a 3-element array or
            # as an object with "0"/"1"/"2" keys; accept both
            if isinstance(triple, list) and len(triple) == 3:
                s, p, o = triple
            elif isinstance(triple, dict):
                s, p, o = triple.get("0", {}), triple.get("1", {}), triple.get("2", {})
            else:
                continue
            if not (isinstance(s, dict) and isinstance(p, dict) and isinstance(o, dict)):
                continue
            if s.get("value") != own_url:
                continue
            if p.get("termType") != "NamedNode":
                continue
            pred = p.get("value")
            value = o.get("value", "")
            language = o.get("language") or "nl"
            if pred == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" and value == "http://schema.org/Person":
                b.add_claim(P_INSTANCE_OF, "item", "Q5")
            elif pred == "http://schema.org/alternateName":
                b.push_alias(language, value)
            elif pred == "http://schema.org/name":
                b.push_label(language, value)
            elif pred == "http://schema.org/description":
                b.push_description(language, value)
            elif pred == "http://schema.org/nationality":
                b.add_prop_text(P_COUNTRY_OF_CITIZENSHIP, value)
            elif pred == "http://schema.org/birthDate":
                self.add_date_claims(b, [value], P_DATE_OF_BIRTH)
            elif pred == "http://schema.org/deathDate":
                self.add_date_claims(b, [value], P_DATE_OF_DEATH)
            elif pred in ("http://schema.org/sameAs", "http://www.w3.org/2002/07/owl#sameAs"):
                extid = url2external_id(value)
                if extid is not None:
                    b.add_claim(extid[0], "extid", extid[1])
        return None

"""GND (Deutsche Nationalbibliothek) parser (reference: /root/reference/src/gnd.rs).

The richest RDF source: dates, nationality (→ P27 via ISO-3166 lookup),
related entities via GND-id lookups (bnode Seq containers), activity
period folding, undifferentiated-person deprecation, redirect ID fixup.
GND is not a valid reference for P27 (gnd.rs:59-65).
"""

from __future__ import annotations

import re

from ..functions.dates import parse_date
from ..functions.rdfxml import Graph
from ..properties import (
    P_CHILD,
    P_COUNTRY_OF_CITIZENSHIP,
    P_DATE_OF_BIRTH,
    P_DATE_OF_DEATH,
    P_FIELD_OF_WORK,
    P_FLORUIT,
    P_GND,
    P_ISO_3166_1_ALPHA_2,
    P_OCCUPATION,
    P_PLACE_OF_BIRTH,
    P_PLACE_OF_DEATH,
    P_SIBLING,
    P_WORK_LOCATION,
    P_WORK_PERIOD_END,
    P_WORK_PERIOD_START,
)
from .base import RDF_TYPE, MetaItemBuilder, SourceParser

RE_COUNTRY = re.compile(r"^https?://d-nb.info/standards/vocab/gnd/geographic-area-code#XA-(.+)$")
RE_SINGLE_YEAR = re.compile(r"^(\d{3,4})$")
RE_YEAR_RANGE = re.compile(r"^(\d{3,4}) *- *(\d{3,4})$")

GNDO = "https://d-nb.info/standards/elementset/gnd#"
AGRELON = "https://d-nb.info/standards/elementset/agrelon#"

KEY_PROP = (
    (f"{GNDO}placeOfBirth", P_PLACE_OF_BIRTH),
    (f"{GNDO}placeOfDeath", P_PLACE_OF_DEATH),
    (f"{AGRELON}hasChild", P_CHILD),
    (f"{AGRELON}hasSibling", P_SIBLING),
    (f"{GNDO}fieldOfStudy", P_FIELD_OF_WORK),
    (f"{GNDO}professionOrOccupation", P_OCCUPATION),
    (f"{GNDO}placeOfActivity", P_WORK_LOCATION),
)


class GndParser(SourceParser):
    source = "gnd"
    property = P_GND
    primary_language = "de"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:
        return f"https://d-nb.info/gnd/{record_id}"

    def ref_for_property(self, prop: int) -> bool:
        # GND's "country" notion is broader than citizenship (gnd.rs:59-65)
        return prop != P_COUNTRY_OF_CITIZENSHIP

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        g = Graph.from_rdfxml(body)
        # redirect fixup: exactly one gndIdentifier literal wins (gnd.rs:260-268)
        ids = g.property_literals(f"{GNDO}gndIdentifier")
        if len(ids) == 1:
            record_id = ids[0]
        id_url = self.get_key_url(record_id)

        undiff = f"{GNDO}UndifferentiatedPerson" in g.subject_iris(id_url, RDF_TYPE)
        if undiff:
            b.add_claim(
                self.property,
                "extid",
                record_id,
                rank="deprecated",
                qualifiers=(("P2241", "item", "Q68648103"),),
            )
        else:
            b.add_claim(self.property, "extid", record_id)
        self.try_viaf(b, record_id)
        self.add_instance_of(b, g, id_url)
        self.add_same_as(b, g, id_url)
        self.add_gender(b, g, id_url)
        self.add_label_aliases(b, g, id_url)
        self.add_description(b, g, id_url)
        self.add_language(b, g, id_url)
        b.clear_descriptions()  # GND descriptions are usually nonsense (gnd.rs:83)

        # nationality → deferred (297, code) lookup, claim P27 without ref
        for url in g.subject_iris(id_url, f"{GNDO}geographicAreaCode"):
            m = RE_COUNTRY.match(url)
            if m:
                code = m.group(1)
                b.add_candidate(
                    "extid",
                    P_COUNTRY_OF_CITIZENSHIP,
                    cand_property=P_ISO_3166_1_ALPHA_2,
                    cand_id=code,
                    fallback_property=P_ISO_3166_1_ALPHA_2,
                    fallback_text=code,
                    has_ref=False,
                )

        for iri, prop in ((f"{GNDO}dateOfBirth", P_DATE_OF_BIRTH), (f"{GNDO}dateOfDeath", P_DATE_OF_DEATH)):
            self.add_date_claims(b, g.subject_literals(id_url, iri), prop)

        # related entities: direct IRIs, then bnode Seq containers (gnd.rs:156-241)
        for elementset, prop in KEY_PROP:
            for url in g.subject_iris(id_url, elementset):
                self._add_gnd_item(b, url, prop)
        for elementset, prop in KEY_PROP:
            for bnode_id in g.subject_bnodes(id_url, elementset):
                for t in g.bnode_triples(bnode_id):
                    if t.p.startswith("http://www.w3.org/1999/02/22-rdf-syntax-ns#_") and t.o_type == "iri":
                        self._add_gnd_item(b, t.o, prop)

        self._activity(b, g)
        return record_id

    def _add_gnd_item(self, b: MetaItemBuilder, url: str, prop: int) -> None:
        gnd_id = url.rsplit("/", 1)[-1]
        if gnd_id:
            b.add_candidate(
                "extid",
                prop,
                cand_property=P_GND,
                cand_id=gnd_id,
                fallback_property=prop,
                fallback_text=url,
                has_ref=self.ref_for_property(prop),
            )
        else:
            b.add_prop_text(prop, url)

    def _activity(self, b: MetaItemBuilder, g: Graph) -> None:
        lits = g.property_literals(f"{GNDO}periodOfActivity")
        if len(lits) != 1:
            return
        lit = lits[0]
        m = RE_SINGLE_YEAR.match(lit)
        if m:
            parsed = parse_date(m.group(1))
            if parsed:
                b.add_claim(P_FLORUIT, "time", parsed[0], obj_precision=parsed[1])
            return
        m = RE_YEAR_RANGE.match(lit)
        if m:
            for grp, prop in ((1, P_WORK_PERIOD_START), (2, P_WORK_PERIOD_END)):
                parsed = parse_date(m.group(grp))
                if parsed:
                    b.add_claim(prop, "time", parsed[0], obj_precision=parsed[1])

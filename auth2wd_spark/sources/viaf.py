"""VIAF cluster-record parser (reference: /root/reference/src/viaf.rs).

VIAF is an aggregator: statements carry no references (viaf.rs:116-118).
Beyond the usual chain it harvests per-source external IDs from the
``sourceID/<KEY>%7C<id>#skos:Concept`` subjects that ``foaf:focus`` the
cluster (viaf.rs:235-253).
"""

from __future__ import annotations

import re

from ..functions.rdfxml import Graph
from ..properties import KEY2PROP, P_VIAF
from .base import MetaItemBuilder, SourceParser

RE_EXT_ID = re.compile(r"^http://viaf.org/viaf/sourceID/(.+?)%7C(.+?)#skos:Concept$")


class ViafParser(SourceParser):
    source = "viaf"
    property = P_VIAF
    primary_language = "en"
    transforms_label = True
    has_ref = False  # aggregator

    def get_key_url(self, record_id: str) -> str:
        return f"http://viaf.org/viaf/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        g = Graph.from_rdfxml(body)
        id_url = self.get_key_url(record_id)
        self.add_the_usual(b, g, record_id, id_url)
        for url in g.property_object_iris("http://xmlns.com/foaf/0.1/focus", id_url):
            m = RE_EXT_ID.match(url)
            if not m:
                continue
            source_key, concept_id = m.group(1), m.group(2)
            prop = KEY2PROP.get(source_key)
            if prop is not None:
                from ..functions.extid import fix_property_value

                b.add_claim(prop, "extid", fix_property_value(prop, concept_id), has_ref=False)
        return None

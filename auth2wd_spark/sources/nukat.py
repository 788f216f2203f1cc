"""NUKAT parser (reference: /root/reference/src/nukat.rs).

The reference resolves a NUKAT id to a VIAF cluster (two API calls,
nukat.rs:69-106); in batch the page body IS the VIAF cluster RDF and the
cluster id is recovered from the graph itself (``foaf:primaryTopic``).
``id_for_viaf`` inserts two spaces after the letter prefix
(nukat.rs:59-67): "n96637319" → "n  96637319".
"""

from __future__ import annotations

import re

from ..functions.rdfxml import Graph
from ..properties import P_NUKAT
from .base import MetaItemBuilder, SourceParser

RE_NUKAT_ID = re.compile(r"^([a-z]+)(\d+)$")
RE_VIAF_URL = re.compile(r"^https?://viaf.org/viaf/(\d+)$")


def id_for_viaf(record_id: str) -> str:
    m = RE_NUKAT_ID.match(record_id)
    if m:
        return f"{m.group(1)}  {m.group(2)}"
    return record_id


class NukatParser(SourceParser):
    source = "nukat"
    property = P_NUKAT
    primary_language = "pl"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:  # resolved per record
        return f"http://viaf.org/viaf/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        g = Graph.from_rdfxml(body)
        viaf_id = None
        for t in g.triples:
            if t.p == "http://xmlns.com/foaf/0.1/primaryTopic" and t.o_type == "iri":
                m = RE_VIAF_URL.match(t.o)
                if m:
                    viaf_id = m.group(1)
                    break
        if viaf_id is None:
            raise ValueError(f"No VIAF cluster ID found for NUKAT ID '{record_id}'")
        id_url = f"http://viaf.org/viaf/{viaf_id}"
        self.add_the_usual(b, g, record_id, id_url)
        return None

"""Library of Congress parser (reference: /root/reference/src/loc.rs).

Sanitizes LOC's strict-parser violations before parsing
(protocol-relative URIs, bare ``lclang=`` attribute; loc.rs:77-81), then
runs only the usual chain.
"""

from __future__ import annotations

from ..functions.rdfxml import Graph
from ..properties import P_LOC
from .base import MetaItemBuilder, SourceParser


def sanitize_rdf(s: str) -> str:
    return (
        s.replace('rdf:resource="//', 'rdf:resource="http://')
        .replace('rdf:about="//', 'rdf:about="http://')
        .replace(' lclang="', ' xml:lang="')
    )


class LocParser(SourceParser):
    source = "loc"
    property = P_LOC
    primary_language = "en"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:
        return f"http://id.loc.gov/authorities/names/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        g = Graph.from_rdfxml(sanitize_rdf(body))
        self.add_the_usual(b, g, record_id, self.get_key_url(record_id))
        return None

"""PubChem CID parser (reference: /root/reference/src/pubchem_cid.rs).

Walks Record.Section → "Names and Identifiers" → Computed Descriptors /
Other Identifiers for SMILES (P233), InChI (P234), InChIKey (P235) and
Nikkaji (P2085); P31=Q113145171, P279=Q11173, label from RecordTitle.
"""

from __future__ import annotations

import json

from ..properties import (
    P_CANONICAL_SMILES,
    P_INCHI,
    P_INCHIKEY,
    P_INSTANCE_OF,
    P_NIKKAJI,
    P_PUBCHEM_CID,
    P_SUBCLASS_OF,
)
from .base import MetaItemBuilder, SourceParser


def _sections(node, heading: str):
    for s in node or []:
        if isinstance(s, dict) and s.get("TOCHeading") == heading:
            return s.get("Section")
    return None


class PubchemParser(SourceParser):
    source = "pubchem"
    property = P_PUBCHEM_CID
    primary_language = "en"

    def get_key_url(self, record_id: str) -> str:
        return f"https://pubchem.ncbi.nlm.nih.gov/compound/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        j = json.loads(body)
        record = j.get("Record") or {}

        b.add_claim(self.property, "extid", record_id)
        b.add_claim(P_INSTANCE_OF, "item", "Q113145171")
        b.add_claim(P_SUBCLASS_OF, "item", "Q11173")

        title = record.get("RecordTitle")
        if isinstance(title, str):
            b.push_label("en", title)

        identifiers = _sections(record.get("Section"), "Names and Identifiers")
        if identifiers is None:
            return None
        computed = _sections(identifiers, "Computed Descriptors")
        if computed is not None:
            for o in computed:
                heading = o.get("TOCHeading") if isinstance(o, dict) else None
                if heading == "SMILES":
                    self._string_values(b, o, P_CANONICAL_SMILES)
                elif heading == "InChI":
                    self._string_values(b, o, P_INCHI)
                elif heading == "InChIKey":
                    self._string_values(b, o, P_INCHIKEY)
        other = _sections(identifiers, "Other Identifiers")
        if other is not None:
            for o in other:
                if isinstance(o, dict) and o.get("TOCHeading") == "Nikkaji Number":
                    self._string_values(b, o, P_NIKKAJI)
        return None

    def _string_values(self, b: MetaItemBuilder, o: dict, prop: int) -> None:
        for information in o.get("Information") or []:
            if not isinstance(information, dict):
                continue
            value = information.get("Value") or {}
            for s in value.get("StringWithMarkup") or []:
                if isinstance(s, dict) and isinstance(s.get("String"), str):
                    b.add_claim(prop, "extid", s["String"])

"""NORAF (Norwegian Authority File, ex-Bibsys) parser
(reference: /root/reference/src/noraf.rs).

MARC-in-JSON: field 100 $a → name (Last, First transform), $d "Y-Y" →
birth/death dates; ``identifiersMap`` first values → external-id claims.
Does NOT run the usual chain (noraf.rs:56-64) — own id only.
"""

from __future__ import annotations

import json
import re

from ..functions.extid import url2external_id
from ..properties import P_DATE_OF_BIRTH, P_DATE_OF_DEATH, P_NORAF
from .base import MetaItemBuilder, SourceParser

RE_BORN_DIED = re.compile(r"^(.*)-(.*)$")


class NorafParser(SourceParser):
    source = "noraf"
    property = P_NORAF
    primary_language = "no"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:
        return f"https://authority.bibsys.no/authority/rest/authorities/v2/{record_id}?format=xml"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        j = json.loads(body)
        b.add_claim(self.property, "extid", record_id)

        for field in j.get("marcdata") or []:
            if not isinstance(field, dict) or field.get("tag") != "100":
                continue
            for sf in field.get("subfields") or []:
                code, value = sf.get("subcode"), sf.get("value")
                if code == "a" and isinstance(value, str):
                    b.push_label(self.primary_language, self.transform_label(value))
                elif code == "d" and isinstance(value, str):
                    m = RE_BORN_DIED.match(value)
                    if m:
                        self.add_date_claims(b, [m.group(1)], P_DATE_OF_BIRTH)
                        self.add_date_claims(b, [m.group(2)], P_DATE_OF_DEATH)

        ids_map = j.get("identifiersMap")
        if isinstance(ids_map, dict):
            for value in ids_map.values():
                if isinstance(value, list) and value and isinstance(value[0], str):
                    extid = url2external_id(value[0])
                    if extid is not None:
                        b.add_claim(extid[0], "extid", extid[1])
        return None

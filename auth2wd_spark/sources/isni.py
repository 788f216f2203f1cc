"""ISNI HTML scraper (reference: /root/reference/src/isni.rs).

Whitespace (incl. newlines) is collapsed to single spaces so the regexes
match across lines (isni.rs:86-93). Emits first VIAF/GND/LOC match and
born/died years (Jan-1 form, precision 9 — isni.rs:97-104). Its "usual"
is only try_viaf + own id (isni.rs:53-58).
"""

from __future__ import annotations

import re

from ..functions.dates import year_to_jan1_time
from ..functions.extid import fix_property_value
from ..properties import P_DATE_OF_BIRTH, P_DATE_OF_DEATH, P_GND, P_ISNI, P_LOC, P_VIAF
from .base import MetaItemBuilder, SourceParser

RE_VIAF = re.compile(r"\bhttps?://viaf.org/viaf/(\d+)")
RE_GND = re.compile(
    r"\bhttps?://d-nb.info/gnd/(1[012]?\d{7}[0-9X]|[47]\d{6}-\d|[1-9]\d{0,7}-[0-9X]|3\d{7}[0-9X])\b"
)
RE_LOC = re.compile(r"\bhttps?://id.loc.gov/authorities/names/(.+?)\"")
RE_BORN_DIED = re.compile(r"<span>Dates:.*?</span>.*?<span>(.+?)</span>")


class IsniParser(SourceParser):
    source = "isni"
    property = P_ISNI
    primary_language = "en"
    transforms_label = True

    def get_key_url(self, record_id: str) -> str:
        return f" https://isni.org/isni/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        record_id = "".join(record_id.split())
        html = " ".join(body.split())
        self.try_viaf(b, record_id)
        b.add_claim(self.property, "extid", record_id)

        m = RE_VIAF.search(html)
        if m:
            b.add_claim(P_VIAF, "extid", m.group(1))
        m = RE_GND.search(html)
        if m:
            b.add_claim(P_GND, "extid", m.group(1))
        m = RE_LOC.search(html)
        if m:
            b.add_claim(P_LOC, "extid", fix_property_value(P_LOC, m.group(1)))

        m = RE_BORN_DIED.search(html)
        if m and "-" in m.group(1):
            born, died = m.group(1).split("-", 1)
            for s, prop in ((born, P_DATE_OF_BIRTH), (died, P_DATE_OF_DEATH)):
                parsed = year_to_jan1_time(s)
                if parsed:
                    b.add_claim(prop, "time", parsed[0], obj_precision=parsed[1])
        return record_id

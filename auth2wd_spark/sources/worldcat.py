"""WorldCat Entities parser (reference: /root/reference/src/worldcat.rs).

Aggregator heavily based on Wikidata → no references (worldcat.rs:38-40).
Dates are assembled from ``time:inDateTime`` parts (year[+month[+day]]).
"""

from __future__ import annotations

import json

from ..functions.dates import parse_date
from ..properties import P_DATE_OF_BIRTH, P_DATE_OF_DEATH, P_INSTANCE_OF, P_WORLDCAT
from .base import MetaItemBuilder, SourceParser


def _dt_part(j, key: str) -> str | None:
    try:
        v = j[key]["@value"]
    except (KeyError, TypeError, IndexError):
        return None
    return v if isinstance(v, str) else None


class WorldcatParser(SourceParser):
    source = "worldcat"
    property = P_WORLDCAT
    primary_language = "en"
    has_ref = False  # aggregator

    def get_key_url(self, record_id: str) -> str:
        return f"https://id.oclc.org/worldcat/entity/{record_id}"

    def run(self, record_id, body, b: MetaItemBuilder, extra_body=None):
        j = json.loads(body)
        b.add_claim(self.property, "extid", record_id, has_ref=False)
        self._add_date(b, j, "dateOfBirth", P_DATE_OF_BIRTH)
        self._add_date(b, j, "dateOfDeath", P_DATE_OF_DEATH)

        for the_type in j.get("type") or []:
            if the_type == "Person":
                b.add_claim(P_INSTANCE_OF, "item", "Q5", has_ref=False)
            elif isinstance(the_type, str):
                b.add_prop_text(P_INSTANCE_OF, the_type)

        labels = j.get("prefLabel")
        if isinstance(labels, dict):
            for language, s in labels.items():
                if isinstance(s, str):
                    b.push_label(language, s)
        aliases = j.get("altLabel")
        if isinstance(aliases, dict):
            for language, vals in aliases.items():
                if isinstance(vals, list):
                    for alias in vals:
                        if isinstance(alias, str):
                            b.push_alias(language, alias)
        descriptions = j.get("description")
        if isinstance(descriptions, dict):
            for language, s in descriptions.items():
                if isinstance(s, str):
                    b.push_description(language, s)
        return None

    def _add_date(self, b: MetaItemBuilder, j, key: str, prop: int) -> None:
        try:
            dt = j[key][0]["time:inDateTime"]
        except (KeyError, TypeError, IndexError):
            return
        time = _dt_part(dt, "time:year")
        if time is None:
            return
        month = _dt_part(dt, "time:month")
        if month is not None:
            day = _dt_part(dt, "time:day")
            if day is not None:
                time += f"-{int(month.replace('-', '')):02d}-{int(day.replace('-', '')):02d}"
            else:
                time += f"-{int(month.replace('-', '')):02d}"
        parsed = parse_date(time)
        if parsed:
            b.add_claim(prop, "time", parsed[0], obj_precision=parsed[1], has_ref=False)

"""Wikibase date parsing.

Pins the observable contract of the reference's ``MetaItem::parse_date``
(/root/reference/src/meta_item.rs:67-70, golden tests :325-343):

    "1987"                         → ("+1987-00-00T00:00:00Z", 9)
    "1987-12"                      → ("+1987-12-00T00:00:00Z", 10)
    "1987-12-27"                   → ("+1987-12-27T00:00:00Z", 11)
    "http://data.bnf.fr/date/1978" → ("+1978-00-00T00:00:00Z", 9)

Precision: 9=year, 10=month, 11=day (Gregorian calendar Q1985727).
"""

from __future__ import annotations

import re

RE_YEAR = re.compile(r"^(\d{3,4})$")
RE_YEAR_MONTH = re.compile(r"^(\d{3,4})-(\d{1,2})$")
RE_FULL = re.compile(r"^(\d{3,4})-(\d{1,2})-(\d{1,2})$")
RE_WIKIBASE_TIME = re.compile(r"^\+(\d{4})-(\d{2})-(\d{2})T00:00:00Z$")
# year embedded in a date URL, e.g. https://data.bnf.fr/date/1936/
RE_URL_YEAR = re.compile(r"^https?://.*/(\d{3,4})/?$")


def parse_date(s: str) -> tuple[str, int] | None:
    """Parse a date string to (wikibase time string, precision) or None."""
    s = s.strip()
    if not s:
        return None
    m = RE_URL_YEAR.match(s) if "://" in s else None
    if m:
        s = m.group(1)
    m = RE_YEAR.match(s)
    if m:
        return (f"+{int(m.group(1)):04d}-00-00T00:00:00Z", 9)
    m = RE_YEAR_MONTH.match(s)
    if m:
        y, mo = int(m.group(1)), int(m.group(2))
        if 1 <= mo <= 12:
            return (f"+{y:04d}-{mo:02d}-00T00:00:00Z", 10)
        return None
    m = RE_FULL.match(s)
    if m:
        y, mo, d = (int(g) for g in m.groups())
        if 1 <= mo <= 12 and 1 <= d <= 31:
            return (f"+{y:04d}-{mo:02d}-{d:02d}T00:00:00Z", 11)
        return None
    m = RE_WIKIBASE_TIME.match(s)
    if m:
        y, mo, d = (int(g) for g in m.groups())
        if d:
            return (s, 11)
        if mo:
            return (s, 10)
        return (s, 9)
    return None


def year_to_jan1_time(s: str) -> tuple[str, int] | None:
    """ISNI-style year extraction: first 3-4 digit run → Jan-1 time, prec 9.

    Distinct from ``parse_date``: the reference's ISNI branch emits
    ``+{Y}-01-01T00:00:00Z`` (not ``-00-00``) at precision 9
    (/root/reference/src/isni.rs:97-104).
    """
    m = re.search(r"(\d{3,4})", s)
    if not m:
        return None
    return (f"+{m.group(1)}-01-01T00:00:00Z", 9)

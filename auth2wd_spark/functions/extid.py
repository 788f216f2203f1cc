"""External-ID extraction and normalization.

Pins the reference's ordered URL→ExternalId regex table
(/root/reference/src/external_importer.rs:19-61, logic :249-261), the
external-URL denylist (:63-75) and per-property ID normalization
(/root/reference/src/external_id.rs:43-60). First match wins; a regex
"matches" when a full replace-all with its template changes the string —
emulated exactly, including templates with groups that may not participate.
"""

from __future__ import annotations

import re

from ..properties import (
    P_BNE,
    P_BNF,
    P_CERL,
    P_FILMPORTAL,
    P_GND,
    P_IDREF,
    P_ISNI,
    P_LOC,
    P_NDL,
    P_NORAF,
    P_NSZL,
    P_ORCID,
    P_PERSEE,
    P_SCOPUS,
    P_SELIBR,
    P_ULAN,
    P_VIAF,
    P_WORLDCAT,
)

# (pattern, template, property) in the reference's order. Templates use
# ${n}; groups that did not participate substitute as "".
# Deviation: the reference's NDL pattern contains the (Rust-specific)
# repetition `\d+{7,9}`; rendered here as `\d{7,9}` which accepts the same
# real-world IDs.
_RAW_TABLE: list[tuple[str, str, int]] = [
    (r"^https?://viaf.org/viaf/(\d+)$", "${1}", P_VIAF),
    (r"^https?://www.viaf.org/viaf/(\d+)$", "${1}", P_VIAF),
    (r"^https?://isni.org/isni/(\d{4})(\d{4})(\d{4})(\d{3}[\dX])$", "${1}${2}${3}${4}", P_ISNI),
    (r"^https?://isni.org/isni/(\d{4})(\d{4})(\d{4})(\d{3}[\dX])$", "${1}${2}${3}${4}", P_ISNI),
    (r"^https?://www.isni.org/isni/(\d{4})(\d{4})(\d{4})(\d{3}[\dX])$", "${1}${2}${3}${4}", P_ISNI),
    (r"^https?://isni-url.oclc.nl/isni/(\d{4})(\d{4})(\d{4})(\d{3}[\dX])$", "${1}${2}${3}${4}", P_ISNI),
    (
        r"^https?://d-nb.info/gnd/(1[012]?\d{7}[0-9X]|[47]\d{6}-\d|[1-9]\d{0,7}-[0-9X]|3\d{7}[0-9X])$",
        "${1}",
        P_GND,
    ),
    (
        r"^https?://id.loc.gov/authorities/names/(gf|n|nb|nr|no|ns|sh|sj)([4-9][0-9]|00|20[0-2][0-9])([0-9]{6})$",
        "${1}${2}${3}",
        P_LOC,
    ),
    (
        r"^https?://id.loc.gov/rwo/agents/(gf|n|nb|nr|no|ns|sh|sj)([4-9][0-9]|00|20[0-2][0-9])([0-9]{6})(\.html)?$",
        "${1}${2}${3}",
        P_LOC,
    ),
    (r"^https?://vocab.getty.edu/ulan/(\d+).*$", "${1}", P_ULAN),
    (
        r"^https?://www.getty.edu/vow/ULANFullDisplay\?find=&role=&nation=&subjectid=(\d+)$",
        "${1}",
        P_ULAN,
    ),
    (r"^https?://viaf.org/processed/JPG|(\d+)$", "${1}", P_ULAN),
    (r"^https?://data.bnf.fr/(\d{8,9}).*$", "${1}", P_BNF),
    (r"^https?://data.bnf.fr/ark:/12148/cb(\d{8,9}[0-9bcdfghjkmnpqrstvwxz]).*$", "${1}", P_BNF),
    (r"^https?://idref.fr/(\d{8}[\dX]).*$", "${1}", P_IDREF),
    (r"^https?://www.idref.fr/(\d{8}[\dX]).*$", "${1}", P_IDREF),
    (r"^https?://id.ndl.go.jp/auth/entity/([a1s]*\d{7,9})$", "${1}", P_NDL),
    (r"^https?://id.ndl.go.jp/auth/ndlna/([a1s]*\d{7,9})$", "${1}", P_NDL),
    (r"^https?://orcid.org/(\d{4}-\d{4}-\d{4}-\d{3}[0-9X])$", "${1}", P_ORCID),
    (r"^https?://www.orcid.org/(\d{4}-\d{4}-\d{4}-\d{3}[0-9X])$", "${1}", P_ORCID),
    (r"^https?://libris.kb.se/resource/auth/([1-9]\d{4,5})$", "${1}", P_SELIBR),
    (r"^https?://datos.bne.es/resource/(XX\d+)$", "${1}", P_BNE),
    (r"^https?://data.bibsys.no/data/notrbib/authorityentry/x([1-9]\d*)$", "${1}", P_NORAF),
    (r"^https?://authority.bibsys.no/authority/rest/authorities/html/([1-9]\d*)$", "${1}", P_NORAF),
    (r"^https?://www.scopus.com/authid/detail.uri\?authorId=([1-9]\d{9,10}).*$", "${1}", P_SCOPUS),
    (r"^https?://data.cerl.org/thesaurus/(c(?:af|nc|ni|nl|np)0\d{7})$", "${1}", P_CERL),
    (r"^https?://data.cerl.org/thesaurus/(.*)$", "${1}", P_CERL),
    (r"^https?://thesaurus.cerl.org/record/(c(?:af|nc|ni|nl|np)0\d{7})$", "${1}", P_CERL),
    (r"^https?://authority\.bibsys\.no/authority/rest/authorities/html/([1-9]\d*).*$", "${1}", P_NORAF),
    (r"^https?://(?:www\.)?viaf\.org/processed/BIBSYS%7C([1-9]\d*)$", "${1}", P_NORAF),
    (r"^https?://authority.bibsys.no/authority/rest/authorities/html/(\d+).*$", "${1}", P_NORAF),
    (r"^https?://entities.oclc.org/worldcat/entity/([^.]+)$", "${1}", P_WORLDCAT),
    (r"^https?://entities.oclc.org/worldcat/entity/([^.]+).html$", "${1}", P_WORLDCAT),
    (r"^https?://entities.oclc.org/worldcat/entity/([^.]+).jsonld$", "${1}", P_WORLDCAT),
    (r"^https?://www.filmportal.de/([A-Za-z0-9]+)$", "${1}", P_FILMPORTAL),
    (r"^https?://nektar.oszk.hu/resource/auth/([1-9]\d*)$", "${1}", P_NSZL),
    (r"^https?://viaf.org/en/viaf/LC%7C(.+)$", "${1}", P_LOC),
    (r"^https?://www.persee.fr/authority/(\d+)$", "${1}", P_PERSEE),
]

_TEMPLATE_GROUP = re.compile(r"\$\{(\d+)\}")

EXTERNAL_ID_REGEXPS: list[tuple[re.Pattern[str], str, int]] = [
    (re.compile(p), t, prop) for (p, t, prop) in _RAW_TABLE
]

DO_NOT_USE_EXTERNAL_URL_REGEXPS: list[re.Pattern[str]] = [
    re.compile(p)
    for p in (
        r"^https?://www.wikidata.org/.*$",
        r"^https?://[a-z-]+.wikipedia.org/.*$",
        r"^https?://viaf.org/viaf/sourceID/.*#skos:Concept$",
        r"^https?://d-nb.info/gnd/.*$",
        r"^https?://www.loc.gov/mads/rdf/v1#.*$",
        r"^https?://www.w3.org/2004/02/skos/core#.*$",
        r"^https?://(www.)?orcid.org/.*-\d{0,3}-.*$",
        r"^https?://data.bnf.fr/#foaf:Person$",
    )
]


def do_not_use_external_url(url: str) -> bool:
    return any(rx.search(url) for rx in DO_NOT_USE_EXTERNAL_URL_REGEXPS)


def _replace_all(rx: re.Pattern[str], template: str, s: str) -> str:
    def repl(m: re.Match[str]) -> str:
        def grp(gm: re.Match[str]) -> str:
            g = int(gm.group(1))
            v = m.group(g) if g <= (m.re.groups or 0) else None
            return v if v is not None else ""

        return _TEMPLATE_GROUP.sub(grp, template)

    return rx.sub(repl, s)


def fix_property_value(prop: int, id_: str) -> str:
    """Per-property ID normalization (external_id.rs:43-60)."""
    if prop == 213:
        return id_.replace(" ", "")
    if prop == 1207:
        return id_.replace("+", "")
    if prop == 244:
        return id_.replace("+", "").replace("%20", "")
    if prop == 1368:
        return id_.replace("LNC10-", "")
    if prop == 8034:
        return id_.replace("_", "/")
    return id_


def url2external_id(url: str) -> tuple[int, str] | None:
    """First-match over the ordered regex table → (property, normalized id).

    The search() gate before _replace_all is a pure fast path: a URL that
    doesn't match can't be rewritten (sub() would return it unchanged), and
    skipping the per-call closure construction for the ~36 non-matching
    patterns is ~2× on this function (extraction-profile hot spot)."""
    for rx, template, prop in EXTERNAL_ID_REGEXPS:
        if rx.search(url) is None:
            continue
        replaced = _replace_all(rx, template, url)
        if replaced != url:
            return (prop, fix_property_value(prop, replaced))
    return None


def subj_key(prop: int, id_: str) -> str:
    """Canonical record/cluster key ``P{prop}:{id}`` (combinator.rs:153)."""
    return f"P{prop}:{id_}"

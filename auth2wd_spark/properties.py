"""Wikidata property constants and static QID lookup tables.

Mirrors the reference vocabulary: /root/reference/src/properties.rs:1-161,
TAXON_MAP / VALID_IMAGE_LICENSES / IUCN_REDLIST
(/root/reference/src/external_importer.rs:78-170) and the VIAF source-key map
KEY2PROP (/root/reference/src/viaf.rs:27-84). Plain dicts: broadcast to
executors inside UDF closures (small, immutable).
"""

# --- property numbers (names follow the reference's P_* constants) ---------
P_SEX_OR_GENDER = 21
P_COUNTRY_OF_CITIZENSHIP = 27
P_INSTANCE_OF = 31
P_PLACE_OF_BIRTH = 19
P_PLACE_OF_DEATH = 20
P_CHILD = 40
P_FIELD_OF_WORK = 101
P_TAXON_RANK = 105
P_OCCUPATION = 106
P_LOCATED_IN = 131
P_IUCN_CONSERVATION_STATUS = 141
P_PARENT_TAXON = 171
P_ISNI = 213
P_VIAF = 214
P_TAXON_NAME = 225
P_GND = 227
P_CANONICAL_SMILES = 233
P_INCHI = 234
P_INCHIKEY = 235
P_LOC = 244
P_ULAN = 245
P_BNF = 268
P_IDREF = 269
P_SUBCLASS_OF = 279
P_ISO_3166_1_ALPHA_2 = 297
P_NDL = 349
P_ORCID = 496
P_DATE_OF_BIRTH = 569
P_DATE_OF_DEATH = 570
P_IUCN_TAXON_ID = 627
P_PUBCHEM_CID = 662
P_NCBI_TAXONOMY = 685
P_GBIF_TAXON = 846
P_SELIBR = 906
P_WORK_LOCATION = 937
P_BNE = 950
P_NB = 1006
P_NORAF = 1015
P_STUDENT_OF = 1066
P_SCOPUS = 1153
P_NUKAT = 1207
P_FLORUIT = 1317
P_LANGUAGES = 1412
P_TAXON_COMMON_NAME = 1843
P_CERL = 1871
P_WORK_PERIOD_START = 2031
P_WORK_PERIOD_END = 2032
P_NIKKAJI = 2085
P_FILMPORTAL = 2639
P_PERSEE = 2732
P_NSZL = 3133
P_INATURALIST_TAXON = 3151
P_SIBLING = 3373
P_COMMONS_COMPATIBLE_IMAGE_URL = 4765
P_WORLDCAT = 10832

# Properties with a registered parser (reference: supported_property.rs:29-53).
SUPPORTED_PROPERTIES = (
    P_ISNI,
    P_VIAF,
    P_GND,
    P_LOC,
    P_NDL,
    P_ULAN,
    P_BNF,
    P_IDREF,
    P_PUBCHEM_CID,
    P_SELIBR,
    P_BNE,
    P_NORAF,
    P_NUKAT,
    P_NB,
    P_WORLDCAT,
    P_INATURALIST_TAXON,
    P_NCBI_TAXONOMY,
    P_GBIF_TAXON,
)

# VIAF source key → Wikidata property (reference: viaf.rs:27-84).
KEY2PROP = {
    "DNB": 227,
    "PLWABN": 7293,
    "BIBSYS": 1015,
    "ICCU": 396,
    "DBC": 3846,
    "FAST": 2163,
    "VLACC": 7024,
    "ISNI": 213,
    "DE633": 5504,
    "LNL": 7026,
    "CAOONL": 8179,
    "EGAXA": 1309,
    "LC": 244,
    "SIMACOB": 1280,
    "NUKAT": 1207,
    "CYT": 1048,
    "NDL": 349,
    "ARBABN": 3788,
    "BLBNB": 4619,
    "BNC": 9984,
    "BNCHL": 7369,
    "ERRR": 6394,
    "GRATEVE": 3348,
    "N6I": 10227,
    "NLI": 949,
    "KRNLK": 5034,
    "LNB": 1368,
    "BNL": 7028,
    "MRBNR": 7058,
    "W2Z": 1015,
    "PTBNP": 1005,
    "NLR": 7029,
    "SELIBR": 906,
    "NKC": 691,
    "NSK": 1375,
    "UIY": 7039,
    "RERO": 3065,
    "NYNYRILM": 9171,
    "SKMASNL": 7700,
    "SUDOC": 269,
    "SRP": 6934,
    "JPG": P_ULAN,
    "BAV": 8034,
}


def prop2key(prop: int) -> str | None:
    """Reverse KEY2PROP lookup (reference: viaf.rs:168-173).

    Two keys map to 1015 (BIBSYS, W2Z); the reference iterates a HashMap so
    either may win — we pin the first in insertion order for determinism.
    """
    for k, v in KEY2PROP.items():
        if v == prop:
            return k
    return None


# Taxon rank name → QID (reference: external_importer.rs:78-147).
# NOTE the reference inserts "form"/"section"/"subsection" twice into a
# HashMap, so the LAST duplicate wins there; a Python dict literal has the
# same last-wins behavior, preserving observable lookups.
TAXON_MAP = {
    "cultivar": "Q4886",
    "species": "Q7432",
    "genus": "Q34740",
    "family": "Q35409",
    "order": "Q36602",
    "kingdom": "Q36732",
    "class": "Q37517",
    "phylum": "Q38348",
    "subspecies": "Q68947",
    "domain": "Q146481",
    "tribe": "Q227936",
    "form": "Q279749",
    "division": "Q334460",
    "subvariety": "Q630771",
    "cryptic species complex": "Q765940",
    "variety": "Q767728",
    "subphylum": "Q1153785",
    "nothospecies": "Q1306176",
    "superspecies": "Q1783100",
    "infraclass": "Q2007442",
    "superfamily": "Q2136103",
    "infraphylum": "Q2361851",
    "subfamily": "Q2455704",
    "subkingdom": "Q2752679",
    "infraorder": "Q2889003",
    "cohorte": "Q2981883",
    "series": "Q3025161",
    "infrakingdom": "Q3150876",
    "section": "Q3181348",
    "subgenus": "Q3238261",
    "branch": "Q3418438",
    "subdomain": "Q3491996",
    "subdivision": "Q3491997",
    "superclass": "Q3504061",
    "forma specialis": "Q3825509",
    "subtribe": "Q3965313",
    "superphylum": "Q3978005",
    "group": "Q4150646",
    "infracohort": "Q4226087",
    "infrafamily": "Q5481039",
    "subclass": "Q5867051",
    "suborder": "Q5867959",
    "superorder": "Q5868144",
    "nothogenus": "Q6045742",
    "magnorder": "Q6054237",
    "supercohort": "Q6054425",
    "infralegion": "Q6054535",
    "sublegion": "Q6054637",
    "superlegion": "Q6054795",
    "parvorder": "Q6311258",
    "grandorder": "Q6462265",
    "legion": "Q7504331",
    "mirorder": "Q7506274",
    "subcohorte": "Q7509617",
    "species group": "Q7574964",
    "epifamily": "Q10296147",
    "subseries": "Q13198444",
    "subform": "Q13202655",
    "supertribe": "Q14817220",
    "superkingdom": "Q19858692",
    "subterclass": "Q21061204",
    "hyporder": "Q21074316",
}
# last-wins duplicates from the reference table:
TAXON_MAP["form"] = "Q5469884"
TAXON_MAP["subsection"] = "Q10861375"
TAXON_MAP["section"] = "Q10861426"

# image license → QID (reference: external_importer.rs:149-157)
VALID_IMAGE_LICENSES = {
    "cc-by-sa": "Q6905942",
    "cc-by": "Q6905323",
    "http://creativecommons.org/licenses/by/4.0/": "Q20007257",
    "http://creativecommons.org/licenses/by-sa/4.0/": "Q18199165",
}

# IUCN status code → QID (reference: external_importer.rs:158-170)
IUCN_REDLIST = {
    "ne": "Q3350324",
    "dd": "Q3245245",
    "lc": "Q211005",
    "nt": "Q719675",
    "vu": "Q278113",
    "en": "Q11394",
    "cr": "Q219127",
    "ew": "Q239509",
    "ex": "Q237350",
}

# languages that get a copy of the taxon-name label
# (reference: external_importer.rs:16)
TAXON_LABEL_LANGUAGES = ("en", "de", "es", "it", "nl", "fr")

# Typed-rescue class constraints (reference: external_importer.rs:727-758).
RESCUE_CLASSES = {
    P_LANGUAGES: ("Q34770",),
    P_LOCATED_IN: ("Q1549591", "Q515"),
    P_COUNTRY_OF_CITIZENSHIP: ("Q6256",),
}

# stated-in QIDs per source property (each parser's my_stated_in)
STATED_IN = {
    P_VIAF: "Q54919",
    P_GND: "Q36578",
    P_LOC: "Q13219454",
    P_BNF: "Q19938912",
    P_ISNI: "Q423048",
    P_IDREF: "Q47757534",
    P_BNE: "Q50358336",
    P_SELIBR: "Q1798125",
    P_NDL: "Q477675",
    P_NORAF: "Q16889143",
    P_NUKAT: "Q11789729",
    P_NB: "Q105488572",
    P_WORLDCAT: "Q112122720",
    P_ULAN: "Q2494649",
    P_INATURALIST_TAXON: "Q16958215",
    P_NCBI_TAXONOMY: "Q13711410",
    P_GBIF_TAXON: "Q1531570",
    P_PUBCHEM_CID: "Q278487",
}

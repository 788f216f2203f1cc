"""Precision/recall gate vs the reference fixture corpus (BASELINE.json).

The expected triple set below is the hand-traced output of the reference's
parsers over its own captured fixtures (each parser's behavior pinned by
the per-parser unit tests replayed in tests/test_parsers.py, FIXTURES.md
§4), plus the deferred-lookup resolutions the golden dimension tables
provide (GOLDEN_ID_TO_QID / GOLDEN_VIAF_LOOKUP in corpus/generate.py —
themselves derived from the reference's viaf_lookup_*.json fixtures).

The gate: micro-averaged precision AND recall ≥ 0.95 over
(subject, predicate, value) triples for every enumerated record after the
FULL Spark pipeline (route → extract → link).
"""

import pytest
from pyspark.sql import functions as F

from auth2wd_spark import schemas
from auth2wd_spark.corpus.generate import build_corpus
from auth2wd_spark.plans.pipeline import PipelineConfig, run_pipeline

# subj → full expected claim set (pred, value)
EXPECTED = {
    # viaf.rs:341-370
    "P214:30701597": {
        ("P214", "30701597"),
        ("P31", "Q5"),
        ("P213", "0000000022760482"),
        ("P227", "132539691"),
    },
    # gnd.rs:384-415 + linking J1 (nationality XA-DE, occupation, birthplace)
    "P227:132539691": {
        ("P227", "132539691"),
        ("P31", "Q5"),
        ("P214", "30701597"),
        ("P213", "0000000022760482"),
        ("P496", "0000-0001-5916-0947"),
        ("P21", "Q6581097"),
        ("P569", "+1974-00-00T00:00:00Z"),
        ("P27", "Q183"),
        ("P106", "Q864503"),
        ("P19", "Q365"),
    },
    # loc.rs:152-204 + J5 (LC|n78095637 → 30701597)
    "P244:n78095637": {
        ("P244", "n78095637"),
        ("P245", "500228559"),
        ("P213", "0000000121251077"),
        ("P1871", "cnp01430658"),
        ("P214", "27063124"),
        ("P214", "30701597"),
    },
    # bnf.rs:178-189
    "P268:11898689q": {
        ("P268", "11898689q"),
        ("P31", "Q5"),
        ("P214", "27063124"),
        ("P269", "026812304"),
        ("P21", "Q6581097"),
        ("P569", "+1809-00-00T00:00:00Z"),
        ("P570", "+1882-00-00T00:00:00Z"),
        ("P569", "+1809-02-12T00:00:00Z"),
        ("P570", "+1882-04-19T00:00:00Z"),
    },
    # id_ref.rs:170-180
    "P269:026812304": {
        ("P269", "026812304"),
        ("P31", "Q5"),
        ("P268", "11898689q"),
        ("P213", "0000000121251077"),
        ("P214", "27063124"),
        ("P2732", "603525"),
        ("P21", "Q6581097"),
        ("P569", "+1809-02-12T00:00:00Z"),
        ("P570", "+1882-04-19T00:00:00Z"),
    },
    # bne.rs:155-165
    "P950:XX1234567": {("P950", "XX1234567"), ("P21", "Q6581097")},
    # selibr.rs:148-175
    "P906:231727": {("P906", "231727"), ("P31", "Q5"), ("P214", "27063124")},
    # ndl.rs:179-196
    "P349:00054222": {
        ("P349", "00054222"),
        ("P31", "Q5"),
        ("P569", "+1867-00-00T00:00:00Z"),
        ("P570", "+1916-00-00T00:00:00Z"),
    },
    # wiremock_tests.rs:161-203
    "P1015:90053126": {
        ("P1015", "90053126"),
        ("P569", "+1875-00-00T00:00:00Z"),
        ("P570", "+1926-00-00T00:00:00Z"),
        ("P213", "0000000121312247"),
        ("P214", "46897170"),
    },
    # nukat.rs:196-210 + J5 (NUKAT|n96637319 → 98777888)
    "P1207:n96637319": {
        ("P1207", "n96637319"),
        ("P31", "Q5"),
        ("P1015", "90711838"),
        ("P244", "n86130265"),
        ("P349", "00467362"),
        ("P213", "0000000122833650"),
        ("P906", "313117"),
        ("P245", "500251202"),
        ("P269", "031911188"),
        ("P214", "98777888"),
    },
    # nb.rs:262-272
    "P1006:068364229": {
        ("P1006", "068364229"),
        ("P569", "+1809-00-00T00:00:00Z"),
        ("P570", "+1882-00-00T00:00:00Z"),
        ("P214", "27063124"),
        ("P213", "0000000121251077"),
        ("P31", "Q5"),
    },
    # worldcat.rs:236-251 — exactly 3 claims
    "P10832:E39PBJrcqvXdm3kkwGr7HVG8md": {
        ("P10832", "E39PBJrcqvXdm3kkwGr7HVG8md"),
        ("P569", "+1950-02-26T00:00:00Z"),
        ("P31", "Q5"),
    },
    # ulan.rs:155-252 + J5 (JPG|500228559 → 27063124)
    "P245:500228559": {
        ("P245", "500228559"),
        ("P244", "n78095637"),
        ("P31", "Q5"),
        ("P214", "27063124"),
    },
    # isni.rs:223-249 + J5 (ISNI → 27063124)
    "P213:0000000121251077": {("P213", "0000000121251077"), ("P214", "27063124")},
    # inaturalist.rs:289-300 — 8 claims; parent taxon ambiguous → dropped
    "P3151:627975": {
        ("P3151", "627975"),
        ("P31", "Q16521"),
        ("P225", "Licea bryophila"),
        ("P105", "Q7432"),
        ("P4765", "https://inaturalist-open-data.s3.amazonaws.com/photos/12948777/medium.jpeg"),
        ("P4765", "https://inaturalist-open-data.s3.amazonaws.com/photos/12948777/original.jpeg"),
        ("P4765", "https://inaturalist-open-data.s3.amazonaws.com/photos/12948778/original.jpeg"),
        ("P4765", "https://inaturalist-open-data.s3.amazonaws.com/photos/12948786/original.jpeg"),
    },
    # ncbi_taxonomy.rs:206-223 — 5 claims incl. resolved parent
    "P685:1747344": {
        ("P685", "1747344"),
        ("P31", "Q16521"),
        ("P225", "Priocnessus nuperus"),
        ("P105", "Q7432"),
        ("P171", "Q26731721"),
    },
    # gbif_taxon.rs:193-208 — 6 claims; parent lookup misses
    "P846:5141342": {
        ("P846", "5141342"),
        ("P31", "Q16521"),
        ("P1843", "Blue Swallowtail"),
        ("P105", "Q7432"),
        ("P4765", "https://inaturalist-open-data.s3.amazonaws.com/photos/605745226/original.jpg"),
        ("P4765", "https://inaturalist-open-data.s3.amazonaws.com/photos/605745239/original.jpg"),
    },
    # pubchem_cid.rs:160-175 — 7 claims
    "P662:22027196": {
        ("P662", "22027196"),
        ("P31", "Q113145171"),
        ("P279", "Q11173"),
        (
            "P234",
            "InChI=1S/C19H24O2/c1-2-3-4-5-6-19(15-7-11-17(20)12-8-15)16-9-13-18(21)14-10-16/h7-14,19-21H,2-6H2,1H3",
        ),
        ("P235", "CZCLTCVIZZPPBW-UHFFFAOYSA-N"),
        ("P233", "CCCCCCC(C1=CC=C(C=C1)O)C2=CC=C(C=C2)O"),
        ("P2085", "J205.459K"),
    },
}


@pytest.fixture(scope="module")
def extracted(spark):
    corpus = build_corpus(n_persons=0, noise_pages=0)
    if not corpus["pages"]:
        pytest.skip("reference fixture corpus not available")
    tables = run_pipeline(
        spark.createDataFrame(corpus["pages"], schema=schemas.PAGES),
        spark.createDataFrame(corpus["id_to_qid"], schema=schemas.ID_TO_QID),
        spark.createDataFrame(corpus["viaf_lookup"], schema=schemas.VIAF_LOOKUP),
        spark.createDataFrame(corpus["valid_gnd_ids"], schema=schemas.VALID_GND_IDS),
        PipelineConfig(),
    )
    rows = (
        tables["triples"]
        .filter(F.col("kind") == "claim")
        .select("subj", "pred", "obj_value")
        .distinct()
        .collect()
    )
    found: dict[str, set] = {}
    for r in rows:
        found.setdefault(r["subj"], set()).add((r["pred"], r["obj_value"]))
    return found


def test_precision_recall(extracted):
    tp = fp = fn = 0
    misses, extras = [], []
    for subj, expected in EXPECTED.items():
        got = extracted.get(subj, set())
        tp += len(got & expected)
        for x in got - expected:
            fp += 1
            extras.append((subj, x))
        for x in expected - got:
            fn += 1
            misses.append((subj, x))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    assert precision >= 0.95, f"precision {precision:.3f}; extras: {extras[:10]}"
    assert recall >= 0.95, f"recall {recall:.3f}; misses: {misses[:10]}"


def test_every_fixture_record_extracted(extracted):
    missing = [s for s in EXPECTED if s not in extracted]
    assert not missing, missing

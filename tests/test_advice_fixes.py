"""Regression pins for the round-1 advisor findings (ADVICE.md):
qualifier-append JSON validity, simhash block derivation, CC
non-convergence signalling, and the byte-aware driver-CC gate."""

import json

import pytest
from pyspark.sql import functions as F

from auth2wd_spark.operators import cc
from auth2wd_spark.operators.merge import fix_dates
from auth2wd_spark.mlops.dedup import simhash_near_dups


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src STRING, dst STRING")


def test_fix_dates_qualifier_append_stays_valid_json(spark):
    """Demoting a date claim that ALREADY carries qualifiers must append
    P2241 inside the existing JSON array (rtrim-based append stripped the
    whole ']]' tail and produced unparseable JSON)."""
    rows = [
        ("c1", "P569", "time", 11, "normal", ""),
        ("c1", "P569", "time", 9, "normal", '[["P580", "time", "+1900-00-00T00:00:00Z"]]'),
    ]
    df = spark.createDataFrame(
        rows,
        "component STRING, pred STRING, obj_type STRING, obj_precision INT, "
        "rank STRING, qualifiers STRING",
    )
    out = {r["obj_precision"]: r for r in fix_dates(df).collect()}
    assert out[11]["rank"] == "normal"
    assert out[9]["rank"] == "deprecated"
    quals = json.loads(out[9]["qualifiers"])  # must parse
    assert ["P580", "time", "+1900-00-00T00:00:00Z"] in quals
    assert ["P2241", "item", "Q42727519"] in quals
    # the empty-qualifiers demotion path still yields a valid single-entry list
    assert json.loads(out[11]["qualifiers"] or "[]") == []


def test_simhash_near_dups_blocks_derived_from_distance(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "entirely unrelated vocabulary in this one"),
        ],
        "doc_id LONG, text STRING",
    )
    exact = {(r["doc_a"], r["doc_b"]) for r in simhash_near_dups(docs, max_hamming=0).collect()}
    assert exact == {(1, 2)}
    # 8 blocks at distance 7: identical pair still found, recall preserved
    wide = {(r["doc_a"], r["doc_b"]) for r in simhash_near_dups(docs, max_hamming=7).collect()}
    assert (1, 2) in wide
    with pytest.raises(AssertionError):
        simhash_near_dups(docs, max_hamming=16)


def test_cc_nonconvergence_raises(spark):
    """Exhausting max_iter without a stable checksum must fail loudly —
    silent exit returned labels pointing at non-root intermediates."""
    pairs = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(40)]
    old = cc.LOCAL_CC_THRESHOLD
    try:
        cc.LOCAL_CC_THRESHOLD = 1  # force the iterative path
        with pytest.raises(RuntimeError, match="did not converge"):
            cc.connected_components(_edges(spark, pairs), max_iter=1)
    finally:
        cc.LOCAL_CC_THRESHOLD = old


def test_cc_byte_cap_forces_distributed_path(spark, monkeypatch):
    """Edge count under the row threshold but over the byte cap (long URI
    keys) must take the distributed path, not collect to the driver."""
    pairs = [("k" * 3000 + f"{i:02d}", "k" * 3000 + f"{i + 1:02d}") for i in range(30)]
    monkeypatch.setattr(cc, "LOCAL_CC_BYTE_CAP", 10_000)

    def _boom(*_a, **_k):
        raise AssertionError("driver union-find used despite byte cap")

    monkeypatch.setattr(cc, "_driver_union_find", _boom)
    labels = {r["node"]: r["component"] for r in cc.connected_components(_edges(spark, pairs)).collect()}
    assert len(set(labels.values())) == 1  # single chain component
    assert min(labels) == min(labels.values())  # canonical min-string label


def test_j2_label_constrained_extid_search(spark):
    """J2 under link(label_retry=True): a (property, id) pair that is
    multi-hit on the id alone is resolved when the record's name matches
    exactly one hit's label; a garbage name stays parked as prop_text
    (mirrors the reference's Magnus-vs-garbage label-search test,
    external_id.rs:325-333 — applied to extids as a gated EXTENSION).

    Default link() is reference behavior (ADVICE r3): extid candidates
    resolve ONLY via the totalhits==1 guard, so BOTH records park."""
    from auth2wd_spark import schemas
    from auth2wd_spark.operators.linking import link

    id_to_qid = spark.createDataFrame(
        [
            (214, "12345", "Q100", "Magnus Manske", "Q5"),
            (214, "12345", "Q200", "Someone Else", "Q5"),  # multi-hit id
        ],
        schema=schemas.ID_TO_QID,
    )
    viaf_lookup = spark.createDataFrame([], schema=schemas.VIAF_LOOKUP)
    valid_gnd = spark.createDataFrame([], schema=schemas.VALID_GND_IDS)

    def cand(subj, name):
        return {
            "subj": subj,
            "kind": "candidate",
            "cand_kind": "extid",
            "cand_property": 214,
            "cand_id": "12345",
            "pred": "P214",
            "has_ref": True,
            "fallback_property": 214,
            "fallback_text": name,
            "rescue": False,
            "ord": 1,
            "src_property": 214,
            "src_id": "12345",
            "src_url": f"test://{subj}",
            "needs_gnd_check": False,
        }

    raw = spark.createDataFrame(
        [cand("rec1", "Magnus Manske"), cand("rec2", "ocshs87gvdsu6gsdi7vchkuchs")],
        schema=schemas.RAW,
    )
    out = link(raw, id_to_qid, viaf_lookup, valid_gnd, label_retry=True)
    claims = {r["subj"]: r for r in out.filter(F.col("kind") == "claim").collect()}
    parked = {r["subj"] for r in out.filter(F.col("kind") == "prop_text").collect()}
    assert claims["rec1"]["obj_value"] == "Q100"  # label disambiguates
    assert "rec2" not in claims and "rec2" in parked

    # reference behavior (the default): multi-hit ids park regardless of label
    out_ref = link(raw, id_to_qid, viaf_lookup, valid_gnd)
    assert out_ref.filter(F.col("kind") == "claim").count() == 0
    parked_ref = {r["subj"] for r in out_ref.filter(F.col("kind") == "prop_text").collect()}
    assert parked_ref == {"rec1", "rec2"}


def test_simhash_blocks_all_supported_distances(spark):
    """Every max_hamming in the asserted range must plan and find the
    identical pair (ceil-width blocks crashed at 11/13/14 and silently
    degenerated to all-pairs at 8)."""
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ee"), (3, "zz yy xx wv uu")],
        "doc_id LONG, text STRING",
    )
    for mh in (8, 11, 13, 14, 15):
        pairs = {(r["doc_a"], r["doc_b"]) for r in simhash_near_dups(docs, max_hamming=mh).collect()}
        assert (1, 2) in pairs, mh

"""Logic-level golden tests pinned to the reference's unit tests.

Each case cites the reference test that pins it (FIXTURES.md §5).
"""

from auth2wd_spark.functions.dates import parse_date, year_to_jan1_time
from auth2wd_spark.functions.extid import (
    do_not_use_external_url,
    fix_property_value,
    url2external_id,
)
from auth2wd_spark.functions.labels import (
    limit_string_length,
    lowercase_first_letter,
    transform_label_last_first_name,
)
from auth2wd_spark.functions.rdfxml import Graph


# meta_item.rs:324-343
def test_parse_date():
    assert parse_date("1987") == ("+1987-00-00T00:00:00Z", 9)
    assert parse_date("1987-12") == ("+1987-12-00T00:00:00Z", 10)
    assert parse_date("1987-12-27") == ("+1987-12-27T00:00:00Z", 11)
    assert parse_date("http://data.bnf.fr/date/1978") == ("+1978-00-00T00:00:00Z", 9)
    # trailing-slash BnF date IRIs appear in real payloads
    assert parse_date("https://data.bnf.fr/date/1936/") == ("+1936-00-00T00:00:00Z", 9)
    assert parse_date("not a date") is None
    assert parse_date("") is None


# isni.rs:97-104 — Jan-1, not -00-00
def test_isni_year():
    assert year_to_jan1_time("1950") == ("+1950-01-01T00:00:00Z", 9)
    assert year_to_jan1_time("ca. 1879)") == ("+1879-01-01T00:00:00Z", 9)
    assert year_to_jan1_time("????") is None


# external_importer.rs:820-837
def test_url2external_id():
    assert url2external_id("http://viaf.org/viaf/12345") == (214, "12345")
    assert url2external_id("https://viaf.org/viaf/12345") == (214, "12345")
    assert url2external_id("https://viaff.org/viaf/12345") != (214, "12345")
    assert url2external_id("https://d-nb.info/gnd/132539691") == (227, "132539691")
    assert url2external_id("https://isni.org/isni/0000000121251077") == (213, "0000000121251077")
    assert url2external_id("http://id.loc.gov/authorities/names/n78095637") == (244, "n78095637")
    assert url2external_id("https://www.example.com/nothing") is None


# external_id.rs:185-188
def test_isni_normalization():
    assert fix_property_value(213, "0000 0001 2184 9233") == "0000000121849233"
    assert fix_property_value(244, "n+78%2095637".replace("%20", "%20")) == "n7895637"
    assert fix_property_value(8034, "a_b") == "a/b"


# external_importer.rs:801-818
def test_denylist():
    assert do_not_use_external_url("https://www.wikidata.org/entity/Q2071541")
    assert do_not_use_external_url("http://www.wikidata.org/entity/Q2071541")
    assert not do_not_use_external_url("https://www.wikidatarrr.org/entity/Q2071541")
    assert do_not_use_external_url("http://data.bnf.fr/#foaf:Person")
    assert do_not_use_external_url("https://de.wikipedia.org/wiki/Magnus_Manske")
    assert do_not_use_external_url("https://d-nb.info/gnd/anything")


# viaf.rs:333-339
def test_transform_label():
    assert transform_label_last_first_name("Manske, Magnus") == "Magnus Manske"
    assert transform_label_last_first_name("Manske,Magnus") == "Manske,Magnus"
    assert transform_label_last_first_name("Magnus Manske") == "Magnus Manske"
    assert transform_label_last_first_name("Månsson, Magnus") == "Magnus Månsson"


# external_importer.rs:839-847
def test_lowercase_first_letter():
    assert lowercase_first_letter("Foo") == "foo"
    assert lowercase_first_letter("foo") == "foo"
    assert lowercase_first_letter("") == ""


# external_importer.rs:566-571 quirk parity
def test_limit_string_length():
    assert limit_string_length("  short  ") == "  short  "  # <250 bytes → original
    long = "a" * 300
    assert limit_string_length(long) == "a" * 250
    multi = "é" * 130  # 260 bytes; byte 250 splits a char
    assert limit_string_length(multi) == "é" * 125  # 250 bytes = 125 chars, boundary OK


def test_rdfxml_basic():
    doc = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:foaf="http://xmlns.com/foaf/0.1/" xmlns:s="http://schema.org/">
      <rdf:Description rdf:about="http://ex.org/a">
        <rdf:type rdf:resource="http://schema.org/Person"/>
        <foaf:name xml:lang="en">Alice</foaf:name>
        <s:knows>
          <rdf:Description rdf:nodeID="b1">
            <foaf:name>Bob</foaf:name>
          </rdf:Description>
        </s:knows>
        <s:list>
          <rdf:Description rdf:nodeID="seq1">
            <rdf:_1 rdf:resource="http://ex.org/x"/>
            <rdf:li rdf:resource="http://ex.org/y"/>
          </rdf:Description>
        </s:list>
      </rdf:Description>
    </rdf:RDF>"""
    g = Graph.from_rdfxml(doc)
    assert g.subject_iris("http://ex.org/a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type") == [
        "http://schema.org/Person"
    ]
    assert g.subject_literals("http://ex.org/a", "http://xmlns.com/foaf/0.1/name") == ["Alice"]
    bnodes = g.subject_bnodes("http://ex.org/a", "http://schema.org/list")
    assert bnodes == ["seq1"]
    members = [
        t.o
        for t in g.bnode_triples("seq1")
        if t.p.startswith("http://www.w3.org/1999/02/22-rdf-syntax-ns#_")
    ]
    assert members == ["http://ex.org/x", "http://ex.org/y"]


def test_rdfxml_fixture_gnd():
    from tests.conftest import read_fixture

    g = Graph.from_rdfxml(read_fixture("gnd_132539691.rdf"))
    subj = "https://d-nb.info/gnd/132539691"
    assert g.subject_literals(subj, "https://d-nb.info/standards/elementset/gnd#dateOfBirth") == ["1974"]
    assert g.subject_iris(subj, "https://d-nb.info/standards/elementset/gnd#gender") == [
        "https://d-nb.info/standards/vocab/gnd/gender#male"
    ]
    assert "Manske, Magnus" in g.subject_literals(
        subj, "https://d-nb.info/standards/elementset/gnd#preferredNameForThePerson"
    )
    # occupation comes via a bnode Seq
    bn = g.subject_bnodes(subj, "https://d-nb.info/standards/elementset/gnd#professionOrOccupation")
    assert len(bn) == 1
    urls = [
        t.o
        for t in g.bnode_triples(bn[0])
        if t.p.startswith("http://www.w3.org/1999/02/22-rdf-syntax-ns#_")
    ]
    assert urls == ["https://d-nb.info/gnd/4131826-2"]

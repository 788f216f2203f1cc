"""Focused pins for the round-6 optimization internals.

Each test pins an equivalence the optimization relied on:
  - duplicate_spans' linear gaps-and-islands boundary formulation vs the
    fold semantics it replaced (merge at gap == k, break at gap == k+1);
  - cms_sketch's single-pass posexplode cells vs independently computed
    per-row counts;
  - the _t(spread=True) reader: same rows, more partitions, and the
    size gate (a table past the gate must come back unspread).
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("AUTH2WD_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDuplicateSpanIslands:
    def test_merge_and_break_boundaries(self, spark):
        from auth2wd_spark.mlops.dedup import duplicate_spans

        k = 3
        # shared(9 tokens) appears in both docs -> every k-gram inside it
        # is duplicated; the u* fillers are unique per doc.
        shared = "a b c d e f g h i"
        d = _docs(
            spark,
            [
                (1, f"{shared} u1 u2 u3 u4 {shared}"),
                (2, f"{shared} v1 v2 v3 v4 {shared}"),
            ],
        )
        out = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in duplicate_spans(d, k=k, min_docs=2).collect()
        }
        # doc layout: positions 0-8 shared, 9-12 unique, 13-21 shared.
        # k-gram start positions marked duplicated: 0..6 and 13..19 —
        # gap 13-6 = 7 > k so TWO islands; spans [0, 6+k-1] and [13, 21].
        expect_per_doc = {(0, 8, 9), (13, 21, 9)}
        for doc_id in (1, 2):
            got = {(s, e, t) for (d_, s, e, t) in out if d_ == doc_id}
            assert got == expect_per_doc

    def test_adjacent_windows_merge_at_gap_k(self, spark):
        from auth2wd_spark.mlops.dedup import duplicate_spans

        k = 3
        # two duplicated k-grams at start positions 0 and 3 (gap == k):
        # the fold merged them into one island [0, 3+k-1]; the linear
        # boundary form must do the same.
        d = _docs(
            spark,
            [
                (1, "a b c x y z q1 q2 q3 q4"),
                (2, "a b c p q r x y z w"),  # "a b c" dup at 0; "x y z" dup elsewhere
            ],
        )
        rows = duplicate_spans(d, k=k, min_docs=2).collect()
        got1 = {(r["span_start"], r["span_end"]) for r in rows if r["doc_id"] == 1}
        # doc1 marked positions: 0 ("a b c") and 3 ("x y z") -> 3 <= 0+k
        # so ONE island [0, 3], span_end = 3 + k - 1 = 5
        assert got1 == {(0, 5)}

    def test_single_position_island(self, spark):
        from auth2wd_spark.mlops.dedup import duplicate_spans

        k = 2
        d = _docs(spark, [(1, "a b u1 u2"), (2, "a b v1 v2")])
        rows = duplicate_spans(d, k=k, min_docs=2).collect()
        got = {(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"]) for r in rows}
        assert got == {(1, 0, 1, 2), (2, 0, 1, 2)}


class TestCmsSinglePass:
    def test_cells_match_reference(self, spark):
        import hashlib

        from auth2wd_spark.mlops.sketch import cms_sketch

        rows = [(1, "x x y"), (2, "y z")]
        depth, width = 3, 16
        ref: dict[tuple, int] = {}
        for _, text in rows:
            for term in text.split():
                for r in range(depth):
                    h = hashlib.md5(f"cms{r}\x1f{term}".encode()).hexdigest()
                    bucket = int(h[:15], 16) % width
                    ref[(r, bucket)] = ref.get((r, bucket), 0) + 1
        got = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_sketch(_docs(spark, rows), depth=depth, width=width).collect()
        }
        assert got == ref


class TestSpreadReader:
    @pytest.fixture(autouse=True)
    def _need_testdata(self):
        if not os.path.isdir(SF_DIR):
            pytest.skip(f"driver testdata not available: {SF_DIR}")

    def test_same_rows_more_partitions(self, spark):
        import __spark_entry__ as entry

        plain = entry._t(spark, SF_DIR, "documents")
        spread = entry._t(spark, SF_DIR, "documents", spread=True)
        assert spread.rdd.getNumPartitions() > plain.rdd.getNumPartitions()
        assert plain.exceptAll(spread).count() == 0
        assert spread.exceptAll(plain).count() == 0

    def test_size_gate_is_layout_driven(self, spark, monkeypatch):
        import __spark_entry__ as entry

        # a table "big enough for the split machinery" must come back
        # unspread — simulate by shrinking the gate to zero bytes
        monkeypatch.setattr(
            os.path, "getsize", lambda p: 10**15, raising=True
        )
        df = entry._t(spark, SF_DIR, "documents", spread=True)
        assert df.rdd.getNumPartitions() == 1

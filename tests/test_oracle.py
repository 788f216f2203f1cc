"""Replicates the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables at
sf0.001, compare row counts + order-insensitive values (columns sorted by
name, rows sorted)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("AUTH2WD_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"driver testdata not available: {SF_DIR}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    try:  # Decimal and ints normalize through str of a canonical form
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(round(float(v), 9))
    except Exception:
        pass
    return str(v)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon(spark_rows, [c.lower() for c in spark_cols])
    b = _canon(duck_rows, [c.lower() for c in duck_cols])
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, f"{name}: value mismatch at {mism}: {[(a[i], b[i]) for i in mism]}"

    # Type-stability: the driver's value hash is pandas-dtype-sensitive
    # (DuckDB HUGEINT/DECIMAL(38,x) land as float64/object while Spark longs
    # stay int64 — round-1 hash failures were exactly this). Assert the two
    # frames agree dtype-for-dtype after sorting columns by name.
    spd = sdf.toPandas()
    dpd = ddb.execute(entry_mod.oracle_sql()[name]).df()
    spd.columns = [c.lower() for c in spd.columns]
    dpd.columns = [c.lower() for c in dpd.columns]
    s_dt = {c: str(spd[c].dtype) for c in sorted(spd.columns)}
    d_dt = {c: str(dpd[c].dtype) for c in sorted(dpd.columns)}
    assert s_dt == d_dt, f"{name}: pandas dtype mismatch {s_dt} vs {d_dt}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema."""
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not available")
    qs = entry_mod.queries()
    for name in set(qs) - set(entry_mod.oracle_sql()):
        df = qs[name](spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("driver testdata not available")
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    """Every oracle_sql key must have a queries() entry (the driver pairs
    them by name); orphan oracles would silently never run."""
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, o - q
    # round 3: every query is oracled (multimodal via its decoder-
    # independent payload facts) — no rows-only remainder
    assert q - o == set()

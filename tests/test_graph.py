"""operators/graph: integer PageRank and degree-oriented triangles.

PageRank is pinned against a pure-Python replay of the exact BIGINT
recurrence (the same bits the DuckDB oracle replays), triangles against
hand graphs (K4, C4) and a seeded random graph vs an itertools
brute-force enumeration. Plan pins prove neither operator ever plans a
Cartesian/BroadcastNestedLoop join.
"""

import itertools
import random

import pytest

from pyspark.sql import functions as F

from auth2wd_spark.operators.graph import PAGERANK_SCALE, pagerank, triangle_count


def _edges_df(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


def _pagerank_replay(pairs, n_iter=3, damping_pct=85, scale=PAGERANK_SCALE):
    """The operator's documented recurrence, serially, in pure ints."""
    edges = sorted(set(pairs))
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    base = (scale * (100 - damping_pct)) // (100 * n)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // outdeg[s]
        rank = {v: base + (damping_pct * inflow[v]) // 100 for v in nodes}
    return rank


CYCLE_PLUS_TAIL = [("A", "B"), ("B", "C"), ("C", "A"), ("D", "A")]


def test_pagerank_matches_integer_replay(spark):
    out = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, CYCLE_PLUS_TAIL), n_iter=3).collect()
    }
    assert out == _pagerank_replay(CYCLE_PLUS_TAIL, n_iter=3)
    # the cycle receives D's mass; D keeps only the base term after it
    # has given its initial mass away — strict order pins propagation
    assert out["A"] > out["B"] > 0 and out["D"] < out["A"]


def test_pagerank_duplicate_edges_collapse(spark):
    dup = CYCLE_PLUS_TAIL + CYCLE_PLUS_TAIL[:2]
    out = {r["node"]: r["rank"] for r in pagerank(_edges_df(spark, dup)).collect()}
    assert out == _pagerank_replay(CYCLE_PLUS_TAIL)


def test_pagerank_mass_never_exceeds_scale(spark):
    random.seed(7)
    pairs = {
        (f"n{random.randrange(30)}", f"n{random.randrange(30)}") for _ in range(120)
    }
    rows = pagerank(_edges_df(spark, pairs), n_iter=4).collect()
    total = sum(r["rank"] for r in rows)
    assert 0 < total <= PAGERANK_SCALE
    assert {r["node"] for r in rows} == {n for e in pairs for n in e}
    replay = _pagerank_replay(pairs, n_iter=4)
    assert {r["node"]: r["rank"] for r in rows} == replay


def _ppr_replay(pairs, seed_nodes, n_iter=3, damping_pct=85, scale=PAGERANK_SCALE):
    edges = sorted(set(pairs))
    nodes = sorted({n for e in edges for n in e})
    seeds = sorted(set(seed_nodes) & set(nodes))
    n_base = len(seeds)
    base = (scale * (100 - damping_pct)) // (100 * n_base)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: (scale // n_base if v in seeds else 0) for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // outdeg[s]
        rank = {
            v: (base if v in seeds else 0) + (damping_pct * inflow[v]) // 100
            for v in nodes
        }
    return rank


def test_personalized_pagerank_matches_replay_and_localizes(spark):
    # two 3-cycles bridged by one edge: seeding in the left cycle must
    # leave the right cycle with strictly less rank than the left
    pairs = [
        ("L1", "L2"), ("L2", "L3"), ("L3", "L1"),
        ("L3", "R1"),
        ("R1", "R2"), ("R2", "R3"), ("R3", "R1"),
    ]
    seeds = spark.createDataFrame([("L1",), ("ghost",)], "node string")
    out = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, pairs), n_iter=3, seeds=seeds).collect()
    }
    assert out == _ppr_replay(pairs, ["L1"], n_iter=3)  # absent seed ignored
    assert out["L1"] > out["R2"] and out["L2"] > out["R2"]


def test_personalized_pagerank_rejects_disjoint_seeds(spark):
    seeds = spark.createDataFrame([("nope",)], "node string")
    with pytest.raises(ValueError, match="no seed overlaps"):
        pagerank(_edges_df(spark, CYCLE_PLUS_TAIL), seeds=seeds)


def test_triangle_k4_and_square(spark):
    k4 = list(itertools.combinations("ABCD", 2))
    out = {r["node"]: r["n_triangles"] for r in triangle_count(_edges_df(spark, k4)).collect()}
    assert out == {"A": 3, "B": 3, "C": 3, "D": 3}
    square = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "A")]
    assert triangle_count(_edges_df(spark, square)).count() == 0


def test_triangle_ignores_direction_dups_and_self_loops(spark):
    messy = [("A", "B"), ("B", "A"), ("B", "C"), ("A", "C"), ("A", "A"), ("B", "C")]
    out = {r["node"]: r["n_triangles"] for r in triangle_count(_edges_df(spark, messy)).collect()}
    assert out == {"A": 1, "B": 1, "C": 1}


def test_triangle_random_vs_bruteforce(spark):
    random.seed(42)
    nodes = [f"n{i}" for i in range(18)]
    und = {
        tuple(sorted(random.sample(nodes, 2)))
        for _ in range(70)
    }
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                expected[v] = expected.get(v, 0) + 1
    out = {r["node"]: r["n_triangles"] for r in triangle_count(_edges_df(spark, und)).collect()}
    assert out == expected


@pytest.mark.parametrize("op", ["pagerank", "triangle"])
def test_plans_never_cartesian(spark, op):
    pairs = [("A", "B"), ("B", "C"), ("C", "A"), ("A", "C")]
    df = (
        pagerank(_edges_df(spark, pairs), n_iter=2, checkpoint=False)
        if op == "pagerank"
        else triangle_count(_edges_df(spark, pairs))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

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

from auth2wd_spark.operators.graph import (
    PAGERANK_SCALE,
    k_hop,
    neighborhood_jaccard,
    pagerank,
    triangle_count,
)


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


def _seeds_df(spark, names):
    return spark.createDataFrame([(n,) for n in names], "node string")


def test_khop_chain_cycle_and_isolated_seed(spark):
    # chain A→B→C→D→E plus back-edge C→A (revisit keeps min depth);
    # seed "iso" has no edges and stays at depth 0
    pairs = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"), ("C", "A")]
    out = {
        r["node"]: r["depth"]
        for r in k_hop(_edges_df(spark, pairs), _seeds_df(spark, ["A", "iso"]), k=3).collect()
    }
    assert out == {"A": 0, "iso": 0, "B": 1, "C": 2, "D": 3}
    assert k_hop(_edges_df(spark, pairs), _seeds_df(spark, ["A"]), k=0).count() == 1


def test_khop_direction_respected(spark):
    pairs = [("B", "A"), ("A", "C")]
    out = {
        r["node"]: r["depth"]
        for r in k_hop(_edges_df(spark, pairs), _seeds_df(spark, ["A"]), k=2).collect()
    }
    assert out == {"A": 0, "C": 1}  # B only reaches A, never the reverse


def test_neighborhood_jaccard_hand_case(spark):
    # X~{P,Q,R}, Y~{P,Q}: common(X,Y)=2, deg X=3, deg Y=2 → 2e6//3.
    # The mirror pair (P,Q) shares {X,Y}: common 2, degs 2+2 → 1e6.
    pairs = [("X", "P"), ("X", "Q"), ("X", "R"), ("Y", "P"), ("Y", "Q")]
    out = {
        (r["node_a"], r["node_b"]): (r["common"], r["jaccard_micro"])
        for r in neighborhood_jaccard(_edges_df(spark, pairs), min_common=2).collect()
    }
    assert out == {("X", "Y"): (2, 2_000_000 // 3), ("P", "Q"): (2, 1_000_000)}


def test_neighborhood_jaccard_hub_cap(spark):
    # hub H (deg 3) is everyone's neighbor; capping at deg ≤ 2 removes
    # it from the common side: the H-mediated pairs XZ/YZ vanish, XY
    # survives only through P, and (H,P) still counts via X and Y
    pairs = [("X", "H"), ("Y", "H"), ("Z", "H"), ("X", "P"), ("Y", "P")]
    uncapped = neighborhood_jaccard(_edges_df(spark, pairs), min_common=1)
    assert uncapped.count() == 4  # XY (via H,P), XZ, YZ (via H), HP (via X,Y)
    capped = {
        (r["node_a"], r["node_b"]): r["common"]
        for r in neighborhood_jaccard(
            _edges_df(spark, pairs), min_common=1, max_neighbor_degree=2
        ).collect()
    }
    assert capped == {("X", "Y"): 1, ("H", "P"): 2}


def test_neighborhood_jaccard_random_vs_bruteforce(spark):
    random.seed(11)
    nodes = [f"n{i}" for i in range(14)]
    und = {tuple(sorted(random.sample(nodes, 2))) for _ in range(40)}
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for x, y in itertools.combinations(sorted(nodes), 2):
        c = len(adj[x] & adj[y])
        if c >= 1:
            expected[(x, y)] = (c, (c * 1_000_000) // (len(adj[x]) + len(adj[y]) - c))
    out = {
        (r["node_a"], r["node_b"]): (r["common"], r["jaccard_micro"])
        for r in neighborhood_jaccard(_edges_df(spark, und)).collect()
    }
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

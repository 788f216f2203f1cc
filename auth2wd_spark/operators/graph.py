"""Graph analytics over the materialized KG: PageRank and triangles.

A KG-construction pipeline doesn't stop at materializing triples — the
downstream consumers (entity-importance ranking for link-candidate
ordering, graph-quality audits, dense-subgraph detection for spam
authority clusters) need whole-graph analytics that the reference
sidesteps at its single-item scale (auth2wd resolves one record at a
time; importance never matters when every request is one entity). At
10^12 documents the co-reference graph is billions of edges and both
operators here are the canonical shuffle-bounded formulations:

``pagerank``
    Fixed-iteration power method with EXACT INTEGER arithmetic: ranks
    live in parts-per-SCALE BIGINT units, each contribution is a BIGINT
    floor division, each update a BIGINT sum — so Spark's partial
    aggregation and a serial SQL replay produce bit-identical ranks
    (the same order-independence trick as the k-means trained-centroid
    oracle, simsearch.train_centroids_kmeans). Per iteration: one join
    of the rank table onto the edge list (shuffle on src) + one groupBy
    dst (shuffle on dst) — both map-side combinable; the edge list is
    persisted once and its partitioning reused across iterations, and
    the (small) rank table is localCheckpoint'ed per iteration to
    truncate lineage exactly like the Lloyd loop. Dangling-node mass
    evaporates (documented classic simplification — the oracle replays
    the same rule, and ranking ORDER is unaffected for fixed N).

``triangle_count``
    Per-node triangle counts via DEGREE-ORIENTED wedge counting
    (compact-forward / Schank-Wagner): orient every undirected edge
    from its lower-(degree, id) endpoint to its higher one, build
    wedges from each node's oriented out-neighbor pairs, and semi-join
    wedges against oriented edges. Orientation bounds every node's
    out-degree by O(sqrt(m)), so the wedge explosion is bounded even on
    power-law graphs where the naive formulation generates
    hub-degree-squared wedges. The triangle SET is orientation
    independent, so the oracle replays the cheap a<b<c id-ordered
    3-way self-join and must agree exactly.

Neither operator shuffles payload columns — both project to bare
(src, dst) BIGINT-able keys first, the same narrow-join discipline as
linking.link().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# total rank mass: big enough that BIGINT floor divisions keep ~6
# significant digits per node at 10^6 nodes, small enough that
# SCALE * damping_pct never overflows BIGINT (9.2e18)
PAGERANK_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
    checkpoint: bool = True,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    ``edges`` needs columns (src, dst); duplicate edges are collapsed
    (a repeated assertion is not a stronger link — same rule as the KG
    edge builder, cc.build_edges). Returns (node, rank) with rank in
    parts-per-``scale`` BIGINT units; sum(rank) ≤ scale (dangling /
    rounding mass evaporates).

    ``seeds`` (a one-column ``node`` DataFrame) switches to PERSONALIZED
    PageRank: teleport mass restarts at the seed set instead of
    everywhere, so rank becomes proximity-to-seeds — the quantity an
    entity linker actually wants when ordering candidate QIDs by
    closeness to the entities already resolved on the same page. Seeds
    absent from the graph are ignored; initial mass and the base term
    concentrate evenly on the surviving seeds.

    Update rule, all BIGINT (bit-identical under any execution order;
    is_base is 1 on teleport targets — every node in the global walk,
    seeds only in the personalized one — and n_base counts them):
        base      = (scale * (100 - damping_pct)) // (100 * n_base)
        contrib_u = rank_u // outdeg_u          (per out-edge of u)
        rank'_v   = is_base_v * base + (damping_pct * sum(contrib)) // 100
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    e = edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    ).distinct()
    # one narrow (src, dst) table persisted once; every iteration's two
    # shuffles (join on src, agg on dst) reuse this single scan
    e = e.persist()
    # explode, not union: one reference to e keeps the logical tree
    # linear (every extra reference re-inlines the whole subtree)
    nodes = e.select(F.explode(F.array("src", "dst")).alias("node")).distinct()
    if seeds is None:
        flagged = nodes.select("node", F.lit(1).alias("is_base")).persist()
        n_base = flagged.count()  # driver scalar
    else:
        s = seeds.select(F.col("node").cast("string").alias("node")).distinct()
        flagged = nodes.join(
            s.select("node", F.lit(1).alias("is_base")), "node", "left"
        ).select(
            "node", F.coalesce(F.col("is_base"), F.lit(0)).alias("is_base")
        ).persist()
        n_base = flagged.filter(F.col("is_base") == 1).count()
        if n_base == 0:
            raise ValueError("no seed overlaps the graph's node set")
    base = (scale * (100 - damping_pct)) // (100 * n_base)

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) is static across iterations — persist it, not
    # the per-iteration joined form
    e_deg = e.join(outdeg, "src").persist()

    ranks = flagged.select(
        "node",
        (F.col("is_base") * F.lit(scale // n_base)).cast("long").alias("rank"),
    )
    for _ in range(n_iter):
        inflow = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(
                F.col("dst"),
                # `div` is exact BIGINT division; a double `/` + cast can
                # round across an integer boundary and break the
                # bit-identical oracle replay
                F.expr("rank div outdeg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            flagged.join(inflow, flagged["node"] == inflow["dst"], "left")
            .select(
                "node",
                (
                    F.col("is_base") * F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(inflow, 0L)) div 100"
                    )
                )
                .cast("long")
                .alias("rank"),
            )
        )
        if checkpoint:
            # rank table is n_nodes rows of (string, long) — cutting the
            # lineage per iteration keeps the final plan depth constant
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def k_hop(edges: DataFrame, sources: DataFrame, k: int = 3) -> DataFrame:
    """Breadth-first k-hop expansion: every node reachable from the
    seed set within ``k`` directed hops, labeled with its minimum depth.

    The generalized form of the reference's cluster expansion (J8:
    grow the entity cluster by following shared-authority-ID edges a
    bounded number of steps — auth2wd's combinator fixpoint, depth-
    bounded). ``edges`` needs (src, dst); ``sources`` a ``node``
    column. Returns (node, depth), depth 0 = the seeds themselves
    (whether or not they appear in the edge list).

    Scale: per hop one equi-join frontier⋈edges (shuffle on src) + one
    anti-join against the visited set (shuffle on node) — frontiers
    only ever shrink the join's left side, and the visited table is
    localCheckpoint'ed so plan depth stays constant in k. No
    whole-graph materialization beyond the reached set.
    """
    if k < 0:
        raise ValueError(f"k must be ≥ 0, got {k}")
    e = (
        edges.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
        .distinct()
        .persist()
    )
    visited = (
        sources.select(F.col("node").cast("string").alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("depth"))
        .localCheckpoint(eager=False)
    )
    frontier = visited.select("node")
    for d in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(d).cast("long").alias("depth"))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return visited


def neighborhood_jaccard(
    edges: DataFrame,
    min_common: int = 1,
    min_jaccard_micro: int = 0,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """Structural-similarity merge candidates: node pairs scored by the
    Jaccard overlap of their (undirected) neighborhoods.

    This is the discovery complement to connected components: CC merges
    entities that share an EXPLICIT authority-ID edge, while two records
    of the same entity that never co-cite an ID still share most of
    their graph context — high neighborhood Jaccard flags them as merge
    CANDIDATES for review. Returns (node_a, node_b, common,
    jaccard_micro) with node_a < node_b, common = |N(a) ∩ N(b)|, and
    jaccard_micro = (common · 10^6) // (deg(a) + deg(b) − common) — an
    exact-BIGINT quotient, replayable bit-identically in SQL.

    Scale: candidate pairs generate ONLY through shared neighbors (the
    triangle wedge trick — never an all-pairs join), so cost is
    sum-over-nodes degree². A hub neighbor shared by everyone is both
    the cost blowup and a near-zero-signal feature (the stopword of
    graphs); ``max_neighbor_degree`` drops such hubs from the COMMON
    side before pair generation — `common` then undercounts through
    hubs only, making scores conservative, and the oracle replays the
    same cap. Degrees in the denominator stay exact full degrees.
    """
    und = (
        edges.select(
            F.least(F.col("src").cast("string"), F.col("dst").cast("string")).alias("a"),
            F.greatest(F.col("src").cast("string"), F.col("dst").cast("string")).alias(
                "b"
            ),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    # (center, neighbor) in both directions, one pass over und
    nbr = und.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("c"), F.col("b").alias("n")),
                F.struct(F.col("b").alias("c"), F.col("a").alias("n")),
            )
        ).alias("p")
    ).select(F.col("p.c").alias("c"), F.col("p.n").alias("n"))
    if max_neighbor_degree is not None:
        cdeg = deg.select(F.col("node").alias("c"), "deg")
        nbr = nbr.join(cdeg, "c").filter(F.col("deg") <= max_neighbor_degree).drop(
            "deg"
        )
    nbr = nbr.localCheckpoint(eager=False)  # referenced twice below
    n1 = nbr.select("c", F.col("n").alias("x"))
    n2 = nbr.select("c", F.col("n").alias("y"))
    common = (
        n1.join(n2, "c")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= min_common)
    )
    dx = deg.select(F.col("node").alias("x"), F.col("deg").alias("deg_x"))
    dy = deg.select(F.col("node").alias("y"), F.col("deg").alias("deg_y"))
    out = (
        common.join(dx, "x")
        .join(dy, "y")
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            F.col("common").cast("long").alias("common"),
            F.expr("(common * 1000000) div (deg_x + deg_y - common)").alias(
                "jaccard_micro"
            ),
        )
        .filter(F.col("jaccard_micro") >= min_jaccard_micro)
    )
    return out


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    ``edges`` needs columns (src, dst); direction, duplicates and
    self-loops are all ignored (canonicalized to min/max pairs). Returns
    (node, n_triangles) for every node that touches ≥1 triangle.

    Scale posture: edges orient low→high by (degree, node) — a total
    order, so every undirected edge gets exactly one direction and every
    triangle exactly one "apex" (its smallest vertex in that order).
    Wedge generation self-joins the oriented edges on the apex; the
    apex's out-degree is bounded by O(sqrt(m)) under this orientation,
    which is the entire point — a raw-id orientation lets one hub with
    10^6 neighbors generate 5·10^11 wedges.
    """
    und = (
        edges.select(
            F.least(F.col("src").cast("string"), F.col("dst").cast("string")).alias("a"),
            F.greatest(F.col("src").cast("string"), F.col("dst").cast("string")).alias(
                "b"
            ),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = und.persist()
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    keyed = und.join(da, "a").join(db, "b")
    fwd = F.struct(F.col("deg_a"), F.col("a")) < F.struct(F.col("deg_b"), F.col("b"))
    # localCheckpoint, not just persist: oriented is referenced three
    # times below (e1, e2, closing) and each reference re-inlines the
    # und+degree subtree into the logical plan — at three references
    # the audit measured a 632-Exchange plan TREE. Truncating lineage
    # here keeps the downstream plan three scans + two joins.
    oriented = (
        keyed.select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .localCheckpoint(eager=False)
    )

    e1 = oriented.select(F.col("u").alias("apex"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u").alias("apex"), F.col("v").alias("y"))
    # each unordered out-neighbor pair once: x strictly before y in any
    # total order — plain string order suffices, the wedge just needs a
    # canonical form to meet the closing edge in one direction
    wedges = e1.join(e2, "apex").filter(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"])  # (apex, x, y) = one triangle, once

    # explode the 3 members of each triangle in one pass (a 3-way union
    # would re-inline the whole wedge join three times)
    per_node = (
        tri.select(F.explode(F.array("apex", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return per_node

"""Connected components over the record ↔ external-id graph.

Replaces the reference's sequential fixpoint worklist
(/root/reference/src/combinator.rs:132-180): records that share any
supported external id (or an inferred VIAF id, combinator.rs:137-147)
belong to one cluster. The crawl loop's BFS rounds become iterations of
min-label propagation with pointer jumping (path halving), which converges
in O(log d) rounds; each round is one shuffle on the label table and is
localCheckpoint()ed to cut lineage (SURVEY §3.2).

Hot entities (a celebrity VIAF id in millions of pages) make high-degree
nodes; label propagation handles them in the groupBy(min) — a single
reduce key — and AQE skew-join splitting covers the join side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..properties import P_VIAF, SUPPORTED_PROPERTIES

EDGE_PROPERTIES = tuple(sorted(set(SUPPORTED_PROPERTIES) | {P_VIAF}))


def build_edges(triples: DataFrame) -> DataFrame:
    """(subj ↔ P{prop}:{id}) edges from non-deprecated external-id claims.

    Mirrors MetaItem::get_external_ids (meta_item.rs:175-182) + the
    parser-availability filter (combinator.rs:53-57): only properties with
    a registered parser (plus P214) can link records into one cluster.
    """
    prop_num = F.regexp_extract("pred", r"^P(\d+)$", 1).cast("int")
    return (
        triples.filter(
            (F.col("kind") == "claim")
            & (F.col("obj_type") == "extid")
            & (F.col("rank") != "deprecated")
        )
        .withColumn("prop_num", prop_num)
        .filter(F.col("prop_num").isin(list(EDGE_PROPERTIES)))
        .select(
            F.col("subj").alias("src"),
            F.concat(F.lit("P"), F.col("prop_num").cast("string"), F.lit(":"), F.col("obj_value")).alias("dst"),
        )
        .distinct()
    )


LOCAL_CC_THRESHOLD = int(os.environ.get("AUTH2WD_CC_LOCAL_THRESHOLD", "32000000"))
# cap on the total src+dst string bytes the driver union-find may collect.
# Sized from measurement, not folklore: the round-2 pandas path multiplied
# key bytes ~4× in Python-object heap, which set the original 256 MiB cap;
# the round-3 Arrow-native path holds keys as Arrow buffers and the
# measured end-to-end working set is ~5× key bytes (448 MB of keys → 2.23 GB
# Python-driver peak RSS, BENCH/cc_gate_ab_result.json — combine_chunks
# copy + dictionary_encode + numpy code/rank arrays). At the 1 GiB default
# the driver peak is ~5 GB, fine for any cluster driver sized ≥16 GB. The
# same A/B measured the crossover the gate encodes: at 9.05M edges / 448 MB
# keys (OVER the old cap) driver-exact ran 23.3/48.8 s vs the star path's
# 284.4/194.7 s on identical checksummed output — the old gate was forcing
# a 4-12× slower plan at sandbox scale. Past the cap, edges genuinely
# outgrow one machine and the distributed star rewrites are the only path.
LOCAL_CC_BYTE_CAP = int(os.environ.get("AUTH2WD_CC_LOCAL_BYTE_CAP", str(1024 * 1024 * 1024)))
# OPT-IN (>0 engages): key-byte volume beyond which the driver path ships
# xxhash64-encoded int64 edge endpoints instead of the key strings.
# Hypothesis tested round 5 (BENCH/cc_hashed_ab_result.json, 5M edges /
# 247 MB keys): the int64 variant measured 26.6-57.5 s vs 18.2-19.7 s for
# the exact-string path — the Arrow string transfer is NOT the floor
# (toArrow 1.4 s, dictionary_encode 1.7 s; the numpy union-find sweep
# itself, 4.0 s, is the largest driver-side term), and the hashed
# variant's extra distributed relabel jobs (distinct over 2·E strings +
# two joins) cost more than they save. Default 0 = disabled; kept as a
# knob because on a REAL cluster (network-attached driver, slower
# transfer) the trade could invert.
LOCAL_CC_HASHED_MIN_BYTES = int(os.environ.get("AUTH2WD_CC_HASHED_MIN_BYTES", "0"))


def connected_components(
    edges: DataFrame, max_iter: int = 25, checkpoint: bool = True
) -> DataFrame:
    """edges (src, dst) → (node, component) with component = min node id.

    Two physical strategies behind one contract (both deterministic —
    component ids are the lexicographic minimum member key):

      - edge sets under LOCAL_CC_THRESHOLD collect to the driver for an
        exact union-find — the same small-side-goes-local reasoning AQE
        applies to joins; anything a test or SF-scale bench produces takes
        this path in microseconds instead of paying per-iteration Spark
        job overhead;
      - larger graphs run alternating large-star/small-star rounds
        (Kiveris et al., "Connected Components in MapReduce and Beyond"):
        edge-set rewrites that converge in O(log²) rounds, each round two
        shuffles, localCheckpoint()ed to cut lineage, converging when the
        edge multiset checksum stabilizes. Hot (high-degree) entity nodes
        are exactly what large-star splits across reducers.
    """
    spark = edges.sparkSession
    proper = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if checkpoint:
        proper = proper.localCheckpoint()  # one materialization feeds both paths
    stats = proper.agg(
        F.count(F.lit(1)).alias("n"),
        # octet_length, not length: the cap reasons about driver heap BYTES,
        # and UTF-8 keys are up to 4 bytes per character
        F.sum(F.octet_length("src") + F.octet_length("dst")).alias("key_bytes"),
    ).collect()[0]
    n_edges = stats["n"]
    if n_edges == 0:
        return spark.createDataFrame([], "node STRING, component STRING")
    # the driver path is gated by BYTES, not just edge count — 2M edges of
    # long URI keys is driver-OOM territory even when the count looks safe.
    # It consumes the DIRECTED edges as-is: the vectorized min-label sweep
    # applies minimum.at on both endpoint arrays, so symmetrization (and
    # the big distinct shuffle it costs) is only paid on the star path.
    if n_edges <= LOCAL_CC_THRESHOLD and (stats["key_bytes"] or 0) <= LOCAL_CC_BYTE_CAP:
        if 0 < LOCAL_CC_HASHED_MIN_BYTES < (stats["key_bytes"] or 0):
            return _driver_union_find_hashed(spark, proper)
        return _driver_union_find(spark, proper)

    sym = proper.union(
        proper.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    if checkpoint:
        sym = sym.localCheckpoint()

    # run the iterative rewrites on 64-bit hashed node ids (≈half the
    # shuffle bytes of the string keys and cheaper comparisons), then
    # relabel components to the canonical lexicographic-min member string.
    # Collision odds at 64 bits are ~n²/2⁶⁵ (≈1e-7 at 10M nodes); a
    # trillion-node deployment swaps in a 128-bit key.
    nodes = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("h", F.xxhash64("node"))
    )
    if checkpoint:
        nodes = nodes.localCheckpoint()
    hsym = (
        sym.join(nodes.select(F.col("node").alias("src"), F.col("h").alias("hsrc")), "src")
        .join(nodes.select(F.col("node").alias("dst"), F.col("h").alias("hdst")), "dst")
        .select(F.col("hsrc").alias("src"), F.col("hdst").alias("dst"))
    )
    hlabels = _large_small_star(hsym, max_iter=max_iter, checkpoint=checkpoint)
    labeled = hlabels.join(nodes.select("node", F.col("h").alias("node_h")).withColumnRenamed("node", "node_str"),
                           hlabels["node"] == F.col("node_h")).select(
        F.col("node_str").alias("node"), F.col("component").alias("hcomp")
    )
    canonical = labeled.groupBy("hcomp").agg(F.min("node").alias("canonical"))
    return labeled.join(canonical, "hcomp").select(
        "node", F.col("canonical").alias("component")
    )


def _min_label_sweep(e_src, e_dst, n_nodes: int):
    """Vectorized min-label propagation with pointer jumping over coded
    edge arrays — the shared core of all three driver paths. The label
    vector is monotonically non-increasing, so the loop provably
    terminates; returns the final parent array (root code per node)."""
    import numpy as np

    parent = np.arange(n_nodes, dtype=np.int64)
    while True:
        m = np.minimum(parent[e_src], parent[e_dst])
        before = parent
        parent = parent.copy()
        np.minimum.at(parent, e_src, m)
        np.minimum.at(parent, e_dst, m)
        for _ in range(3):  # pointer jumping halves tree height per pass
            parent = parent[parent]
        if np.array_equal(before, parent):
            break
    return parent


def _driver_union_find(spark, edges: DataFrame) -> DataFrame:
    """Exact driver-local components; deterministic min-string labels.

    Arrow-NATIVE end to end (round 3): `df.toArrow()` fetch and
    `createDataFrame(pa.Table)` return move the keys as Arrow buffers —
    no Python string objects are ever materialized. Node-id interning is
    pyarrow `dictionary_encode` (C++), the min-label sweep is
    `np.minimum.at` over the code arrays with pointer jumping, and the
    lexicographic-min member per component comes from a `sort_indices`
    RANK of the dictionary (UTF-8 byte order == code-point order) reduced
    with one more `minimum.at` — so the published component id matches the
    distributed path's `min(node)` exactly.

    Measured at 5.3M edges / 3.16M nodes (the 800k-person scaling corpus):
    8.6 s total, vs 72 s for the round-2 pandas version — toPandas object
    conversion (29 s) and pandas object-dtype groupby-min (30 s) were the
    "serial CC floor" every scaling session measured; the union-find
    itself is ~1.5 s. The label vector is monotonically non-increasing,
    so the loop provably terminates.
    """
    import numpy as np

    try:
        import pyarrow as pa
        import pyarrow.compute as pc

        tbl = edges.select("src", "dst").toArrow()
    except (ImportError, AttributeError):  # pre-Arrow-API Spark: pandas path
        return _driver_union_find_pandas(spark, edges)

    # large_string: 64-bit offsets, so a raised AUTH2WD_CC_LOCAL_BYTE_CAP
    # (>2 GiB of keys) cannot overflow combine_chunks' int32 offset space
    combined = (
        pa.chunked_array(tbl.column("src").chunks + tbl.column("dst").chunks)
        .cast(pa.large_string())
        .combine_chunks()
    )
    enc = combined.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    dictionary = enc.dictionary
    n_edges = tbl.num_rows
    e_src = codes[:n_edges]
    e_dst = codes[n_edges:]
    parent = _min_label_sweep(e_src, e_dst, len(dictionary))
    n = len(dictionary)
    sort_idx = pc.sort_indices(dictionary).to_numpy().astype(np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sort_idx] = np.arange(n)
    min_rank = np.full(n, np.iinfo(np.int64).max)
    np.minimum.at(min_rank, parent, rank)  # per-root lexicographic min
    comp_code = sort_idx[min_rank[parent]]
    out = pa.table(
        {"node": dictionary, "component": pc.take(dictionary, pa.array(comp_code))}
    )
    return spark.createDataFrame(out)


def _driver_union_find_hashed(spark, edges: DataFrame) -> DataFrame:
    """Driver union-find over xxhash64-ENCODED endpoints (round 5).

    Executors hash both key strings, so the driver fetches two int64
    columns (16 bytes/edge) instead of the raw keys — at 7M edges that is
    ~110 MB vs ~450 MB of Arrow string buffers, and the per-leg serial
    term that capped every scaling session shrinks proportionally. The
    min-label sweep runs in hash space (np.unique interning — an int64
    sort, no string objects); the published component id must still be
    the lexicographic-min member STRING, so the (hash → root-hash) result
    ships back as an Arrow table and the relabel (distinct nodes →
    groupBy(root) min(node) → join) runs DISTRIBUTED — work that scales
    with executors instead of adding to the driver floor.

    Collision odds are the star path's documented ~n²/2⁶⁵ trade
    (cc.py:107); the exact-string path below remains the default under
    LOCAL_CC_HASHED_MIN_BYTES.
    """
    import numpy as np

    try:
        import pyarrow as pa

        tbl = edges.select(
            F.xxhash64("src").alias("hsrc"), F.xxhash64("dst").alias("hdst")
        ).toArrow()
    except (ImportError, AttributeError):
        return _driver_union_find_pandas(spark, edges)

    hs = tbl.column("hsrc").combine_chunks().to_numpy(zero_copy_only=False)
    hd = tbl.column("hdst").combine_chunks().to_numpy(zero_copy_only=False)
    both = np.concatenate([hs, hd])
    uniq, codes = np.unique(both, return_inverse=True)
    n_edges = len(hs)
    e_src = codes[:n_edges].astype(np.int64)
    e_dst = codes[n_edges:].astype(np.int64)
    parent = _min_label_sweep(e_src, e_dst, len(uniq))
    # no localCheckpoint: the table is already driver-local (LocalTableScan)
    # and checkpointed blocks here would leak per invocation — a long-lived
    # session calling CC repeatedly would grow storage memory without bound
    hmap = spark.createDataFrame(
        pa.table({"h": pa.array(uniq), "root_h": pa.array(uniq[parent])})
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("h", F.xxhash64("node"))
    )
    labeled = nodes.join(hmap, "h").select("node", "root_h")
    canonical = labeled.groupBy("root_h").agg(F.min("node").alias("component"))
    return labeled.join(canonical, "root_h").select("node", "component")


def _driver_union_find_pandas(spark, edges: DataFrame) -> DataFrame:
    """Fallback for Spark builds without toArrow/Arrow-table createDataFrame."""
    import numpy as np
    import pandas as pd

    old_arrow = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "false")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    try:
        pdf = edges.select("src", "dst").toPandas()

        both = np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()])
        codes, nodes = pd.factorize(both)
        n_edges = len(pdf)
        e_src = codes[:n_edges]
        e_dst = codes[n_edges:]
        parent = _min_label_sweep(e_src, e_dst, len(nodes))
        out = pd.DataFrame({"node": nodes, "root": parent})
        out["component"] = out["root"].map(out.groupby("root")["node"].min())
        return spark.createDataFrame(
            out[["node", "component"]], "node STRING, component STRING"
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old_arrow)


def _large_small_star(sym: DataFrame, max_iter: int, checkpoint: bool) -> DataFrame:
    """Alternating large-star/small-star over the edge set."""
    spark = sym.sparkSession
    # Catalyst's union constraint rewriting can fail with
    # "key not found: src#N" on the self-referential union+checkpoint shape
    # of this loop (seen on Spark 4.1); constraints add nothing here.
    old_cp = spark.conf.get("spark.sql.constraintPropagation.enabled", "true")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try:
        return _large_small_star_loop(sym, max_iter, checkpoint)
    finally:
        spark.conf.set("spark.sql.constraintPropagation.enabled", old_cp)


def _large_small_star_loop(sym: DataFrame, max_iter: int, checkpoint: bool) -> DataFrame:
    edges = sym  # symmetric to start; rounds keep a directed (big→small) set
    prev_checksum = None
    converged = False
    for _ in range(max_iter):
        # large-star: for every u, attach its larger neighbors to
        # m = min(N(u) ∪ {u})
        both = edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = both.groupBy(F.col("src").alias("node")).agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        large = (
            both.filter(F.col("dst") > F.col("src"))
            .join(mins, both["src"] == mins["node"])
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # small-star: orient big→small, attach all small neighbors (and u)
        # to the minimum
        directed = large.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        smins = directed.groupBy(F.col("src").alias("node")).agg(F.min("dst").alias("m"))
        small_nbrs = (
            directed.join(smins, directed["src"] == smins["node"])
            .filter(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        small_self = smins.select(F.col("node").alias("src"), F.col("m").alias("dst"))
        edges = small_nbrs.union(small_self).filter(F.col("src") != F.col("dst")).distinct()
        if checkpoint:
            edges = edges.localCheckpoint()
        checksum = edges.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: long would overflow under ANSI arithmetic
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        key = (checksum["n"], checksum["h"])
        if key == prev_checksum:
            converged = True
            break
        prev_checksum = key

    if not converged:
        # returning here would hand out labels pointing at non-root
        # intermediates (wrong components) with no signal — fail loudly
        raise RuntimeError(
            f"connected components did not converge within max_iter={max_iter} "
            "star rounds; raise max_iter (rounds needed grow ~log(diameter))"
        )

    # converged: every edge points node → component root
    roots = edges.select(F.col("dst").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return edges.select(F.col("src").alias("node"), F.col("dst").alias("component")).union(
        roots
    ).distinct()


def assign_components(
    triples: DataFrame, labels: DataFrame, broadcast_max_rows: int | None = None
) -> DataFrame:
    """Map each subj to its component id; singletons keep subj as component.

    Round 6: the label table is two narrow string columns with one row per
    clustered node — orders of magnitude smaller than the 21-column triples
    table, whose SMJ shuffle was the bulk of the assign phase (140 MB of
    shuffle at the sf0.1 bench vs a ~60 MB broadcast). Same count-gated
    explicit broadcast as linking.link(): at or under the gate the side is
    provably broadcast-sized, above it the join falls back to AQE choice
    (the 100 TB path, where labels outgrow executor memory). The count is
    cheap — the driver-CC path returns a local Arrow table, and the star
    path's labels derive from checkpointed edges.
    """
    if broadcast_max_rows is None:
        from .linking import LINK_BROADCAST_MAX_ROWS

        broadcast_max_rows = LINK_BROADCAST_MAX_ROWS
    lab = labels.select(F.col("node").alias("subj"), "component")
    if broadcast_max_rows > 0 and labels.count() <= broadcast_max_rows:
        lab = F.broadcast(lab)
    return triples.join(lab, "subj", "left").withColumn(
        "component", F.coalesce("component", "subj")
    )

#!/usr/bin/env python
"""A/B: driver exact-Arrow union-find vs distributed star path at the edge
volume where the round-5 2M-person scaling corpus crossed the dispatch gate
(~9M edges, ~450 MB of key bytes — OVER the historic 256 MiB byte cap).

The 256 MiB LOCAL_CC_BYTE_CAP was sized for the round-2 pandas path, where
Python string objects multiplied key bytes ~4x in driver heap. The round-3
Arrow-native path holds the keys as Arrow buffers (no Python objects), so
the honest cap is whatever the measured peak RSS supports. This script
measures wall time for BOTH paths on the same localCheckpoint'ed edges and
the driver Python process peak RSS (ru_maxrss) attributable to the exact
path, and verifies the two outputs are checksum-identical. Run ALONE (host
steal contaminates).

Usage: python BENCH/cc_gate_ab.py [n_records]   # default 4.5M -> ~9.05M edges
"""
import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from auth2wd_spark.operators import cc  # noqa: E402
from auth2wd_spark.session import build_session  # noqa: E402


def _run(spark, edges, force_star: bool):
    saved = (cc.LOCAL_CC_THRESHOLD, cc.LOCAL_CC_BYTE_CAP)
    try:
        if force_star:
            cc.LOCAL_CC_THRESHOLD = 0
        else:
            cc.LOCAL_CC_THRESHOLD = 1 << 40
            cc.LOCAL_CC_BYTE_CAP = 1 << 40
        t0 = time.perf_counter()
        out = cc.connected_components(edges)
        chk = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("node", "component").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return round(time.perf_counter() - t0, 2), (chk["n"], str(chk["h"]))
    finally:
        cc.LOCAL_CC_THRESHOLD, cc.LOCAL_CC_BYTE_CAP = saved


def main():
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 4_500_000
    spark = build_session(app_name="cc-gate-ab", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    # same synthetic shape as cc_hashed_ab.py: ~2.01 edges/record, shared
    # external-id tails forming multi-record clusters, one hot node
    rec = spark.range(n_records).select(
        F.concat(F.lit("https://example.org/auth/record/"), F.col("id")).alias("src"),
        F.col("id").alias("i"),
    )
    e1 = rec.select("src", F.concat(F.lit("P214:"), (F.col("i") % (n_records // 7)).cast("string")).alias("dst"))
    e2 = rec.select("src", F.concat(F.lit("P227:"), (F.col("i") % (n_records // 13)).cast("string")).alias("dst"))
    hot = rec.filter(F.col("i") % 100 == 0).select("src", F.lit("P214:hot-entity").alias("dst"))
    edges = e1.union(e2).union(hot).localCheckpoint()
    n = edges.count()
    kb = edges.agg(F.sum(F.octet_length("src") + F.octet_length("dst"))).collect()[0][0]
    print(f"edges={n} key_bytes={kb / 1e6:.0f}MB", file=sys.stderr)

    results = {"n_edges": n, "key_mb": round(kb / 1e6, 1), "reps": []}
    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    sig = None
    for rep in range(2):
        row = {}
        for name, force_star in (("driver_exact", False), ("star", True)):
            sec, key = _run(spark, edges, force_star)
            row[name] = sec
            if sig is None:
                sig = key
            assert key == sig, f"{name} output diverged: {key} vs {sig}"
            if rep == 0 and name == "driver_exact":
                rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                results["driver_py_rss_mb"] = {
                    "before": round(rss_before / 1024, 1),
                    "peak_after_exact": round(rss_after / 1024, 1),
                }
        results["reps"].append(row)
        print(json.dumps(row), file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

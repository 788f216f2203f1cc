#!/usr/bin/env python
"""A/B: exact-string vs hashed-int64 driver union-find at scaling-corpus
edge volume (round-5 verdict ask #6 — shrink the CC serial term).

Builds a synthetic edge table shaped like the real graph (record keys +
"P214:<id>" external-id keys, ~1.4 edges/record, one hot node), then times
both driver paths back-to-back in the same session, twice, and verifies
the outputs are IDENTICAL. Run ALONE (host steal contaminates).

Usage: python BENCH/cc_hashed_ab.py [n_records]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from auth2wd_spark.operators.cc import (  # noqa: E402
    _driver_union_find,
    _driver_union_find_hashed,
)
from auth2wd_spark.session import build_session  # noqa: E402


def main():
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    spark = build_session(app_name="cc-hashed-ab", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    # ~2.4 edges/record: two extid keys per record (7-way + 13-way shared
    # tails form multi-record clusters), plus a hot node over 1% of records
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
    sig = None
    for rep in range(2):
        row = {}
        for name, fn in (("exact", _driver_union_find), ("hashed", _driver_union_find_hashed)):
            t0 = time.perf_counter()
            out = fn(spark, edges)
            # checksum forces full materialization AND verifies identity
            chk = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64("node", "component").cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
            row[name] = round(time.perf_counter() - t0, 2)
            key = (chk["n"], str(chk["h"]))
            if sig is None:
                sig = key
            assert key == sig, f"{name} output diverged: {key} vs {sig}"
            # NOTE: no release_all_cached here — it would drop the edges
            # localCheckpoint blocks, which cannot be recomputed (truncated
            # lineage). The ~64 MB hmap checkpoints from the hashed path
            # accumulate across 4 calls; acceptable.
        results["reps"].append(row)
        print(json.dumps(row), file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""A/B: is build_edges' `.distinct()` a data no-op that costs a shuffle?

Hypothesis (round 5): upstream claim dedup (A1 dedup-on-insert,
sources/base.py) already makes (page, prop, value) unique, so the edge
set build_edges emits has ~zero duplicate (src, dst) pairs — and the
driver union-find doesn't need deduped edges anyway (duplicate edges
cannot change min-label propagation). If that holds, the distinct is a
full shuffle of the edge strings bought for nothing on the CC hot path.

Protocol: bench corpus (sf0.1 defaults, 443k pages), extract + link once,
then alternate connected_components over distinct / raw edges
back-to-back in one session; outputs checksum-compared for identity.

Run: python BENCH/cc_distinct_ab.py   (writes cc_distinct_ab_result.json)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .appName("cc-distinct-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from auth2wd_spark.corpus.generate import distributed_corpus
    from auth2wd_spark.operators.cc import build_edges, connected_components
    from auth2wd_spark.operators.extract import extract_pages
    from auth2wd_spark.operators.linking import link
    from auth2wd_spark.session import ship_package

    ship_package(spark)
    corpus = distributed_corpus(
        spark, n_persons=200_000, noise_pages=20_000, include_fixtures=True,
        hot_fraction=0.1,
    )
    pages = corpus["pages"].persist()
    pages.count()
    dims = {k: corpus[k].persist() for k in ("id_to_qid", "viaf_lookup", "valid_gnd_ids")}
    for d in dims.values():
        d.count()
    triples = link(
        extract_pages(pages), dims["id_to_qid"], dims["viaf_lookup"],
        dims["valid_gnd_ids"],
    ).localCheckpoint()

    distinct_edges = build_edges(triples)          # current: with .distinct()
    raw_edges = _build_edges_nodistinct(triples)   # candidate: without

    n_raw = raw_edges.count()
    n_distinct = distinct_edges.count()

    def checksum(labels):
        r = labels.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("node", "component").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (r["n"], str(r["h"]))

    reps = []
    sums = set()
    for rep in range(2):
        for name, e in (("distinct", distinct_edges), ("raw", raw_edges)):
            t0 = time.perf_counter()
            labels = connected_components(e)
            s = checksum(labels)
            dt = round(time.perf_counter() - t0, 2)
            sums.add(s)
            reps.append({"rep": rep, "variant": name, "cc_sec": dt})
            print(name, rep, dt, s, file=sys.stderr)

    result = {
        "experiment": "build_edges distinct() vs raw edges into connected_components",
        "setup": "200k persons + 20k noise (443k pages), local[8], "
                 "alternating back-to-back in one session, labels checksum-compared",
        "n_edges_raw": n_raw,
        "n_edges_distinct": n_distinct,
        "duplicate_edges": n_raw - n_distinct,
        "reps": reps,
        "outputs_identical": len(sums) == 1,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cc_distinct_ab_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


def _build_edges_nodistinct(triples):
    from auth2wd_spark.operators.cc import EDGE_PROPERTIES

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
            F.concat(F.lit("P"), F.col("prop_num").cast("string"), F.lit(":"),
                     F.col("obj_value")).alias("dst"),
        )
    )


if __name__ == "__main__":
    main()

"""A/B: minhash signature strategy — explode+groupBy vs shuffle-free HOF.

A (status quo): explode tokens → md5 digests in a codegen'd projection →
groupBy(doc_id).agg(min × 16). Pays n_docs × n_tokens row materialization
plus a (map-side-combined) shuffle, but the md5s run inside whole-stage
codegen.

B (strategy="hof"): transform+aggregate over the per-document token
array — zero Exchange, row count stays n_docs, but higher-order-function
lambdas are interpreted per element, so the same md5s run outside
codegen.

Both full minhash_lsh_candidates timings (the headline query shape, where
the band self-join adds its own shuffles either way) and signature-only
timings are recorded, alternating A/B back-to-back inside one session so
host weather hits both arms equally.

Run: python BENCH/minhash_hof_ab.py   [AB_CPUS=32] [AB_SF_DIR=/root/testdata/sf0.1]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from auth2wd_spark.mlops.dedup import minhash_lsh_candidates, minhash_signatures
from auth2wd_spark.session import build_session


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cpus = int(os.environ.get("AB_CPUS", "32"))
    sf_dir = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = docs.select("doc_id", "text").localCheckpoint()  # exclude scan from timings
    force(docs)  # warm

    arms = {
        "sig_explode": lambda: minhash_signatures(docs, 16, hash_fn="md5"),
        "sig_hof": lambda: minhash_signatures(docs, 16, hash_fn="md5", strategy="hof"),
        "lsh_explode": lambda: minhash_lsh_candidates(docs, 16, 4, hash_fn="md5"),
        "lsh_hof": lambda: minhash_lsh_candidates(
            docs, 16, 4, hash_fn="md5", strategy="hof"
        ),
    }
    reps = int(os.environ.get("AB_REPS", "3"))
    out = {k: [] for k in arms}
    for rep in range(reps):
        for name, build in arms.items():
            t0 = time.monotonic()
            force(build())
            out[name].append(round(time.monotonic() - t0, 3))
    summary = {k: {"reps": v, "best": min(v)} for k, v in out.items()}
    print(json.dumps({"cpus": cpus, "sf_dir": sf_dir, "arms": summary}, indent=1))


if __name__ == "__main__":
    main()

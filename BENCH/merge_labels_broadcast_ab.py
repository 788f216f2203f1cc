"""A/B: should the driver-CC label table carry a broadcast hint into the
merge phase's assign_components join?

Motivation (round 5): the merge-phase claims plan executes the
triples × CC-labels join as 3 SortMergeJoins / 0 broadcasts (the
fix_dates maxes branch re-executes the assign join), and link() was
cured of an environment-dependent broadcast flip the same round — so a
count-gated hint on the driver-local label table (whose row count is
known WITHOUT a job) looked like the same free win.

Protocol: one session, corpus + extract + link + CC once; then build
with_comp from hinted vs unhinted labels and force merge_component's
claims+labels tables, alternating 3 reps back-to-back.

Result (200k persons + 20k noise, 443k pages, 3.46M triples, local[32]):

    rep 0: hint 47.64   plain 20.83   (first-touch warmup, discard)
    rep 1: hint 17.11   plain 16.41
    rep 2: hint 16.77   plain 16.00

REJECTED: a wash trending slightly worse. The SMJ exchange of the claim
subset is ~20 MB at this scale — cheap and fully parallel — while the
~1.3M-row label broadcast costs driver-side serialization plus a hash
build in every probe task. Unlike the link() case there is no
environment-flip risk to insure against: sort-merge IS the baseline
here, in every environment. The plan-shape observation stands (2 of the
3 SMJs become BHJs under the hint) — it just doesn't buy time at any
scale the driver path serves, and past the driver-path gate the labels
are too big to broadcast anyway.

Run: python BENCH/merge_labels_broadcast_ab.py
"""

import time

from pyspark.sql import SparkSession


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .appName("merge-labels-broadcast-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from auth2wd_spark.corpus.generate import distributed_corpus
    from auth2wd_spark.operators import cc as cc_mod
    from auth2wd_spark.operators.extract import extract_pages
    from auth2wd_spark.operators.linking import link
    from auth2wd_spark.operators.merge import merge_component
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
    labels = cc_mod.connected_components(cc_mod.build_edges(triples))

    def merge_force(lab):
        wc = cc_mod.assign_components(triples, lab)
        t0 = time.perf_counter()
        tabs = merge_component(wc)
        tabs["claims"].write.format("noop").mode("overwrite").save()
        tabs["labels"].write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    for rep in range(3):
        for name, lab in (("hint", F.broadcast(labels)), ("plain", labels)):
            print(rep, name, merge_force(lab), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

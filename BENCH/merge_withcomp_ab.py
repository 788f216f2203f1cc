"""A/B: should `with_comp` (the assign_components join output) be
materialized once before merge_component's consumers?

Motivation (round 5): merge_component fans with_comp out to six tables;
the bench forces two (claims + labels) and run_resumable writes all six
— every consumer re-executes the triples x labels join. Prior A/B
(merge_labels_broadcast_ab) showed the join's exchange is cheap (~20 MB)
but each consumer still rescans the wide checkpointed triples. One
localCheckpoint trades a single write of the joined table for N-1
rescans+joins.

Protocol: corpus + extract + link + CC once; then alternate back-to-back
reps of A (status quo: lazy with_comp, force claims+labels) vs
B (localCheckpoint(with_comp), force claims+labels), then a second pair
forcing ALL SIX tables (the run_resumable shape). Checkpoint build time
is INCLUDED in B's timing (it's part of the strategy's cost).

Run: python BENCH/merge_withcomp_ab.py
Knobs: AB_CPUS (default 32), AB_PERSONS (default 200000) — the round-5
follow-up used them to disambiguate whether the scaling-leg regression
was a core-count or a corpus-size effect.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from auth2wd_spark.corpus.generate import distributed_corpus
from auth2wd_spark.operators.cc import assign_components, build_edges, connected_components
from auth2wd_spark.operators.extract import extract_pages
from auth2wd_spark.operators.linking import link
from auth2wd_spark.operators.merge import merge_component
from auth2wd_spark.session import build_session


def force(df):
    df.write.format("noop").mode("overwrite").save()


def run(tables, names):
    for n in names:
        force(tables[n])


def main():
    cpus = int(os.environ.get("AB_CPUS", "32"))
    n_persons = int(os.environ.get("AB_PERSONS", "200000"))
    spark = build_session(app_name="merge-withcomp-ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    print("cpus", cpus, "persons", n_persons, flush=True)
    corpus = distributed_corpus(
        spark, n_persons=n_persons, noise_pages=n_persons // 10, include_fixtures=True
    )
    pages = corpus["pages"].persist(StorageLevel.MEMORY_AND_DISK)
    pages.count()
    dims = {k: corpus[k].persist() for k in ("id_to_qid", "viaf_lookup", "valid_gnd_ids")}
    for d in dims.values():
        d.count()
    raw = extract_pages(pages)
    triples = link(
        raw, dims["id_to_qid"], dims["viaf_lookup"], dims["valid_gnd_ids"]
    ).localCheckpoint()
    labels = connected_components(build_edges(triples))
    print("triples:", triples.count(), flush=True)

    two = ("claims", "labels")
    six = ("claims", "labels", "aliases", "descriptions", "prop_text", "members")
    results = {}
    for rep in range(int(os.environ.get("AB_REPS", "3"))):
        for variant in ("A", "B"):
            for names, tag in ((two, "2tab"), (six, "6tab")):
                wc = assign_components(triples, labels)
                t0 = time.perf_counter()
                if variant == "B":
                    wc = wc.localCheckpoint()
                run(merge_component(wc, ref_cap=None), names)
                dt = round(time.perf_counter() - t0, 2)
                results.setdefault(f"{variant}_{tag}", []).append(dt)
                print(rep, variant, tag, dt, flush=True)
                if variant == "B":
                    # free the checkpointed blocks before the next trial
                    spark.sparkContext._jsc.sc().cleaner().get()

    for k, v in sorted(results.items()):
        print(k, v, "min", min(v), flush=True)


if __name__ == "__main__":
    main()

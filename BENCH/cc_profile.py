"""Profile the cc_sec phase sub-steps at scaling-session size.

Session-11 anatomy says cc_sec is ~37 s serial-equivalent at 1.6M
persons (39.9 s at 8 cores vs 49.3 s at 2 — efficiency 0.31), the
single fattest term in the paired-2v8 Amdahl budget. This script
reproduces one hi leg up to the CC phase and times every sub-step of
`connected_components` individually so the next optimization targets
the measured floor instead of the assumed one.

Run: SPARK_GRAFT_CC_PROFILE_PERSONS=1600000 python BENCH/cc_profile.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main():
    n_persons = int(os.environ.get("SPARK_GRAFT_CC_PROFILE_PERSONS", "1600000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    from auth2wd_spark.session import build_session
    from auth2wd_spark.corpus.generate import distributed_corpus
    from auth2wd_spark.operators.extract import extract_pages
    from auth2wd_spark.operators.linking import link
    from auth2wd_spark.operators.cc import (
        build_edges,
        _min_label_sweep,
    )
    from pyspark import StorageLevel

    spark = build_session(app_name=f"cc-profile-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = distributed_corpus(
        spark,
        n_persons=n_persons,
        noise_pages=max(50, n_persons // 10),
        include_fixtures=True,
        hot_fraction=0.1,
    )
    pages = corpus["pages"].persist(StorageLevel.MEMORY_AND_DISK)
    n_pages = pages.count()
    dims = {}
    for name in ("id_to_qid", "viaf_lookup", "valid_gnd_ids"):
        dims[name] = corpus[name].persist()
        dims[name].count()

    t = {}

    def clock(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 3)
        print(json.dumps({name: t[name]}), flush=True)
        return out

    raw = clock("extract_sec", lambda: extract_pages(pages))
    triples = clock(
        "link_sec",
        lambda: link(
            raw, dims["id_to_qid"], dims["viaf_lookup"], dims["valid_gnd_ids"]
        ).localCheckpoint(),
    )

    # ---- connected_components sub-steps, inlined with timers ----
    edges = build_edges(triples)
    proper = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    proper = clock("cc_checkpoint_proper", proper.localCheckpoint)
    stats = clock(
        "cc_stats_agg",
        lambda: proper.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("src") + F.octet_length("dst")).alias("key_bytes"),
        ).collect()[0],
    )
    print(json.dumps({"n_edges": stats["n"], "key_bytes": stats["key_bytes"]}), flush=True)

    tbl = clock("cc_toArrow", lambda: proper.select("src", "dst").toArrow())
    combined = clock(
        "cc_combine_chunks",
        lambda: pa.chunked_array(tbl.column("src").chunks + tbl.column("dst").chunks)
        .cast(pa.large_string())
        .combine_chunks(),
    )
    enc = clock("cc_dictionary_encode", combined.dictionary_encode)
    codes = clock("cc_codes_to_numpy", lambda: enc.indices.to_numpy().astype(np.int64))
    dictionary = enc.dictionary
    n_edges = tbl.num_rows
    e_src = codes[:n_edges]
    e_dst = codes[n_edges:]
    parent = clock("cc_sweep", lambda: _min_label_sweep(e_src, e_dst, len(dictionary)))
    n = len(dictionary)
    print(json.dumps({"n_nodes": n}), flush=True)

    def _rank_and_label():
        sort_idx = pc.sort_indices(dictionary).to_numpy().astype(np.int64)
        rank = np.empty(n, dtype=np.int64)
        rank[sort_idx] = np.arange(n)
        min_rank = np.full(n, np.iinfo(np.int64).max)
        np.minimum.at(min_rank, parent, rank)
        return sort_idx[min_rank[parent]]

    comp_code = clock("cc_rank_label", _rank_and_label)
    out = clock(
        "cc_pa_table",
        lambda: pa.table(
            {"node": dictionary, "component": pc.take(dictionary, pa.array(comp_code))}
        ),
    )
    labels = clock("cc_createDataFrame", lambda: spark.createDataFrame(out))
    # what the pipeline's downstream actually pays for the LocalTableScan:
    clock("cc_labels_count_action", labels.count)

    result = {
        "n_persons": n_persons,
        "cpus": cpus,
        "pages": n_pages,
        "timings": t,
    }
    with open(os.path.join(REPO, "BENCH", "cc_profile_result.json"), "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Structured Streaming extraction + item-JSON / N-Triples sinks."""

import json
import os

import pytest
from pyspark.sql import functions as F

from auth2wd_spark import schemas
from auth2wd_spark.corpus.generate import build_corpus
from auth2wd_spark.plans.pipeline import run_pipeline
from auth2wd_spark.plans.sink import items_json, ntriples
from auth2wd_spark.streaming.extract_stream import (
    read_page_stream,
    start_triples_stream,
    windowed_page_counts,
)


@pytest.fixture(scope="module")
def corpus():
    return build_corpus(n_persons=8, noise_pages=2)


def test_streaming_extraction(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    input_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    os.makedirs(input_dir)
    spark.createDataFrame(corpus["pages"], schema=schemas.PAGES).write.mode(
        "overwrite"
    ).parquet(input_dir)
    dims = {
        n: spark.createDataFrame(corpus[n], schema=getattr(schemas, n.upper()))
        for n in ("id_to_qid", "viaf_lookup", "valid_gnd_ids")
    }

    stream = read_page_stream(spark, input_dir, max_files_per_trigger=4)
    q = start_triples_stream(
        stream, dims["id_to_qid"], dims["viaf_lookup"], dims["valid_gnd_ids"], out_dir, ckpt
    )
    q.awaitTermination(300)

    streamed = spark.read.parquet(out_dir)
    assert streamed.filter(F.col("kind") == "claim").count() > 0

    # streamed output must equal the batch pipeline's linked triples
    batch = run_pipeline(
        spark.createDataFrame(corpus["pages"], schema=schemas.PAGES),
        dims["id_to_qid"],
        dims["viaf_lookup"],
        dims["valid_gnd_ids"],
    )["triples"]
    key_cols = ["subj", "kind", "pred", "obj_value"]
    a = {tuple(r) for r in streamed.select(*key_cols).distinct().collect()}
    b = {tuple(r) for r in batch.select(*key_cols).distinct().collect()}
    assert a == b


def test_windowed_counts_stream(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("streamw")
    input_dir = str(base / "in")
    os.makedirs(input_dir)
    spark.createDataFrame(corpus["pages"], schema=schemas.PAGES).write.mode(
        "overwrite"
    ).parquet(input_dir)
    counts = windowed_page_counts(read_page_stream(spark, input_dir))
    q = (
        counts.writeStream.format("memory")
        .queryName("page_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(base / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    # append mode only emits closed windows; the query must at least run
    assert spark.table("page_counts").columns == ["window_start", "lang", "n_pages"]


@pytest.fixture(scope="module")
def tables(spark, corpus):
    return run_pipeline(
        spark.createDataFrame(corpus["pages"], schema=schemas.PAGES),
        spark.createDataFrame(corpus["id_to_qid"], schema=schemas.ID_TO_QID),
        spark.createDataFrame(corpus["viaf_lookup"], schema=schemas.VIAF_LOOKUP),
        spark.createDataFrame(corpus["valid_gnd_ids"], schema=schemas.VALID_GND_IDS),
    )


def test_items_json(tables):
    out = items_json(tables)
    rows = out.collect()
    assert rows
    doc = json.loads(rows[0]["item_json"])
    assert doc["item"]["type"] == "item"
    # every claim is parseable and carries property/type/value
    some = [r for r in rows if json.loads(r["item_json"])["item"].get("claims")]
    claims = json.loads(some[0]["item_json"])["item"]["claims"]
    c0 = json.loads(claims[0])
    assert {"property", "type", "value", "rank"} <= set(c0)


def test_ntriples(tables):
    lines = [r["line"] for r in ntriples(tables["triples"]).collect()]
    assert lines
    assert all(line.endswith(" .") for line in lines)
    assert any("<http://www.wikidata.org/entity/Q5>" in line for line in lines)


def test_cms_sketch_stream_equals_batch(spark, tmp_path_factory):
    """The bounded-state pin: the streaming CMS (complete mode, no
    watermark) emits a sketch bit-identical to the batch builder over
    the same documents — the depth×width state bound is what makes the
    unbounded running aggregation legal at all."""
    from auth2wd_spark.mlops.sketch import cms_sketch
    from auth2wd_spark.streaming.sketch_stream import cms_sketch_stream

    base = tmp_path_factory.mktemp("streamcms")
    input_dir = str(base / "in")
    os.makedirs(input_dir)
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} x{i % 3} common word") for i in range(200)],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(input_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)  # force multiple micro-batches
        .parquet(input_dir)
    )
    q = (
        cms_sketch_stream(stream, depth=3, width=16)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(base / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    got = {(r["row"], r["bucket"]): r["cnt"] for r in spark.table("cms_stream").collect()}
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(docs, depth=3, width=16).collect()
    }
    assert got == want


def test_hll_registers_stream_equals_batch(spark, tmp_path_factory):
    """Same bounded-state argument as the streaming CMS, applied to max:
    the streaming HLL registers after consuming all micro-batches are
    bit-identical to the batch builder over the same documents."""
    from pyspark.sql import functions as F

    from auth2wd_spark.mlops.sketch import hll_registers
    from auth2wd_spark.streaming.sketch_stream import hll_registers_stream

    base = tmp_path_factory.mktemp("streamhll")
    input_dir = str(base / "in")
    os.makedirs(input_dir)
    docs = spark.createDataFrame(
        [(i, f"alpha{i % 37} beta{i % 11} shared") for i in range(300)],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(input_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    q = (
        hll_registers_stream(stream, p=7)
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(base / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    got = {(r["bucket"], r["register"]) for r in spark.table("hll_stream").collect()}
    toks = docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"))
    want = {(r["bucket"], r["register"]) for r in hll_registers(toks, p=7).collect()}
    assert got == want and len(got) <= 128


def test_cms_windowed_stream_append_equals_batch(spark, tmp_path_factory):
    """The watermark-evicted regime: closed event-time windows emit
    once in APPEND mode and their cells are bit-identical to the batch
    sketch of the same window's documents. A far-future flush row
    advances the watermark so both data windows finalize."""
    import datetime as dt

    from pyspark.sql import functions as F

    from auth2wd_spark.mlops.sketch import cms_sketch
    from auth2wd_spark.streaming.sketch_stream import cms_sketch_windowed_stream

    base = tmp_path_factory.mktemp("streamwcms")
    input_dir = str(base / "in")
    os.makedirs(input_dir)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for i in range(120):  # window 0: minutes 0-9, window 1: minutes 10-19
        rows.append((i, t0 + dt.timedelta(minutes=(i % 20)), f"w{i % 13} common"))
    docs = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    docs.write.mode("overwrite").parquet(input_dir)
    # the watermark pump must be the LAST file processed — if it came
    # early, every later data row would be "late" and silently dropped.
    # FileStreamSource orders by modification time, so write it after a
    # full mtime tick.
    import time

    time.sleep(1.1)
    flush = spark.createDataFrame(
        [(999, t0 + dt.timedelta(hours=2), "flush")],
        "doc_id long, ts timestamp, text string",
    )
    flush.coalesce(1).write.mode("append").parquet(input_dir)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    q = (
        # delay (30 min) > the 20-min data span: no data row can go late
        # regardless of which files land in which micro-batch; only the
        # 2-hour flush row advances the watermark past both windows
        cms_sketch_windowed_stream(
            stream, window_duration="10 minutes", watermark="30 minutes",
            depth=3, width=16,
        )
        .writeStream.format("memory")
        .queryName("wcms_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(base / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.table("wcms_stream").collect()
    got = {}
    for r in emitted:
        got.setdefault(r["window"]["start"], {})[(r["row"], r["bucket"])] = r["cnt"]
    # both 10-minute data windows must have closed (flush row is 2h out)
    w0, w1 = t0, t0 + dt.timedelta(minutes=10)
    assert w0 in got and w1 in got
    for wstart in (w0, w1):
        wdocs = docs.filter(
            (F.col("ts") >= wstart)
            & (F.col("ts") < wstart + dt.timedelta(minutes=10))
        ).select("doc_id", "text")
        want = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_sketch(wdocs, depth=3, width=16).collect()
        }
        assert got[wstart] == want
    # bounded state: every emitted window obeys the depth×width cap
    for cells in got.values():
        assert len(cells) <= 3 * 16

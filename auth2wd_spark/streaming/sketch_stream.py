"""Streaming count-min sketch — running corpus term frequencies.

The batch sketch (mlops/sketch.cms_sketch) is legal as a STREAMING
aggregation with no modification, and that is not a coincidence: the
reason the sketch works at 100 TB batch scale — the groupBy(row, bucket)
state is bounded by depth·width cells no matter how large the vocabulary
— is exactly the property Structured Streaming requires of an unbounded
running aggregation. No watermark is needed because nothing is ever
evicted: the sketch is a monotone running summary of the whole stream,
queryable at every micro-batch, and its state cannot grow. Contrast
dedup_recrawls_stream (extract_stream.py), where per-key state is
unbounded and the watermark is what saves it.

A per-window variant (sketch of the last N minutes) would add
`F.window(ts, ...)` to the grouping key and a watermark to bound the
number of LIVE windows — state then = windows × depth·width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..mlops.sketch import TOKEN_SPLIT, cms_sketch, hll_registers


def cms_sketch_stream(
    documents_stream: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Running count-min sketch over a document stream. Use with
    outputMode("complete") — the result is ≤ depth·width rows, so
    complete-mode re-emission is a constant-size write per micro-batch.

    Returns the same (row, bucket, cnt) schema as the batch builder;
    after any micro-batch the emitted sketch is BIT-IDENTICAL to
    cms_sketch() run over the pages consumed so far (pinned by
    tests/test_streaming_and_sink.py::test_cms_sketch_stream_equals_batch),
    so downstream heavy-hitter probes can't tell which engine mode
    built their sketch.
    """
    return cms_sketch(documents_stream, depth=depth, width=width, text_col=text_col)


def cms_sketch_windowed_stream(
    documents_stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "5 minutes",
    depth: int = 4,
    width: int = 256,
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Per-event-time-window count-min sketch with a watermark — the
    OTHER streaming-state regime, completing the bracket the module
    docstring describes: the running sketch's state is bounded because
    nothing evicts; this one's is bounded because the watermark evicts
    — live_windows × depth·width cells, with closed windows emitted
    exactly once in APPEND mode (each is final: event time can no
    longer reach it), so a downstream job can persist per-window
    heavy-hitter sketches as an immutable time series.

    Returns (window, row, bucket, cnt) where window is the usual
    struct<start,end>. After the stream drains, the emitted rows for a
    closed window are BIT-IDENTICAL to the batch sketch of that
    window's documents (pinned in tests/test_streaming_and_sink.py) —
    the same cells, computed by the same expressions, grouped by the
    same window boundaries `F.window` assigns in batch mode.
    """
    from ..mlops.sketch import _bucket

    toks = documents_stream.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        F.explode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
    )
    # single-pass depth-way fan-out (array explode, no stream union)
    cells = toks.select(
        F.col(ts_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col("term"), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    )
    return (
        cells.groupBy(
            F.window(F.col(ts_col), window_duration).alias("window"),
            F.col("cell.row").alias("row"),
            F.col("cell.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hll_registers_stream(
    documents_stream: DataFrame,
    p: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Running HyperLogLog registers over a document stream — the
    cardinality companion to the running CMS. Same legality argument:
    groupBy(bucket).max state is bounded by 2^p cells, max is a monotone
    running summary (nothing evicts, no watermark), and complete-mode
    re-emission is ≤ 2^p rows per micro-batch. After any micro-batch the
    registers are BIT-IDENTICAL to hll_registers() over the pages
    consumed so far, so the batch estimator (mlops/sketch.hll_distinct's
    one-row tail) reads a live stream's registers unchanged.
    """
    toks = documents_stream.select(
        F.explode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)).alias("term")
    )
    return hll_registers(toks, "term", p=p)

"""Sequence-shaping operators for LM training pipelines: split documents
into fixed-token training chunks, and pack variable-length documents into
fixed-capacity training sequences.

Both are exact integer constructions over the whitespace token count —
no RNG, no floats — so a 100 TB chunking job is deterministic across
retries and engines, and the DuckDB oracle replays every boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_SPLIT = r"\s+"


def _words(text_col: str):
    return F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: token windows of `chunk_tokens` advancing
    by stride = chunk_tokens − overlap, the standard long-document →
    context-window preprocessing shape (each chunk carries `overlap`
    tokens of left context so no boundary-spanning span is lost).

    Chunk starts are 1, 1+stride, … ; the number of chunks is
    1 + ceil((n_tokens − chunk_tokens) / stride) when the document
    overflows one window, else 1 — so the final chunk may be short but a
    pure-overlap tail chunk is never emitted. Everything runs inside
    per-row array expressions (transform/slice/array_join → one explode)
    — zero shuffle, embarrassingly parallel.

    Returns (doc_id, chunk_id, n_tokens, chunk_text); chunk_id is
    1-based, n_tokens is the chunk's own length.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    words = _words(text_col)
    n = F.size(words)
    n_chunks = F.when(
        n <= chunk_tokens, F.lit(1)
    ).otherwise(
        F.lit(1) + F.floor((n - F.lit(chunk_tokens) + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(words, F.lit(1) + (i - 1) * stride, chunk_tokens).alias("w"),
        ),
    )
    return documents.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        F.col(id_col),
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c.w").cast("long").alias("n_tokens"),
        F.array_join("c.w", " ").alias("chunk_text"),
    )


def pack_sequences(
    documents: DataFrame,
    capacity_tokens: int = 512,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-split sequence packing (the GPT-style recipe: documents
    are concatenated in a fixed order and the token stream is cut into
    capacity-sized training sequences): each document is assigned the
    sequence in which it BEGINS plus its offset there, from a running
    token total over a deterministic order.

    The running total is a window — and an unbucketed global window is a
    single-reducer sort, the classic 100 TB killer — so documents are
    first routed to one of `n_buckets` independent packing streams by a
    portable md5 hash of the id (pack order inside a bucket is doc_id
    order). Buckets bound every sort partition at corpus/n_buckets and
    the streams are embarrassingly parallel; a real deployment sizes
    n_buckets to executor count × a small factor.

    Returns (doc_id, bucket, seq_id, offset_in_seq, n_tokens): sequence
    seq_id (0-based, per bucket) starts at token offset_in_seq for this
    document; a document longer than the remaining capacity simply spans
    the boundary, exactly like the training-time token stream.
    """
    n = F.size(_words(text_col)).cast("long")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("long")
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = documents.select(F.col(id_col), bucket.alias("bucket"), n.alias("n_tokens"))
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("cum_before")
    return staged.select(id_col, "bucket", "n_tokens", cum_before).select(
        F.col(id_col),
        "bucket",
        F.floor(F.col("cum_before") / F.lit(capacity_tokens)).cast("long").alias("seq_id"),
        (F.col("cum_before") % F.lit(capacity_tokens)).cast("long").alias("offset_in_seq"),
        "n_tokens",
    )

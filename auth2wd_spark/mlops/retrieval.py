"""BM25 keyword retrieval over the corpus (Robertson & Zaragoza 2009,
the Lucene-variant idf) — the lexical-search counterpart to the ANN
stack: the query a training-data curator runs to pull every document
matching a probe phrase, ranked.

Scale shape: ONE corpus scan builds per-doc term frequencies for the
query terms only (a semi-join against a handful of broadcast terms —
the inverted-index probe re-expressed as a filter, so 100 TB of
non-matching text is pruned at the scan), one tiny doc-frequency agg
(≤ n_query_terms rows), and one doc-keyed sum. No UDFs, no windows
except the final fixed-size top-k.

Determinism contract (the repo's exact-integer pattern): idf is
quantized to micro units once per query term — the ONLY ln in the job —
and each (doc, term) contribution is rounded to a BIGINT before the
per-doc sum, so the sum is associative-order-independent across
engines. The length normalization dl/avgdl is computed as
dl·N/total_tokens (two exact BIGINTs dividing in one double op) rather
than via a pre-divided avgdl, so both engines evaluate the identical
IEEE expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = r"\s+"
_MICRO = 1_000_000


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    topk: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/T))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) ≥ 0 (the Lucene
    form). Returns (doc_id, score_micro, n_hit_terms) — score_micro is
    the exact BIGINT sum of per-term micro-quantized contributions;
    ties rank by doc_id ascending, so the result set is total-ordered
    and engine-independent.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    words = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)

    # one scan: per-doc length + tf of each query term (array filter —
    # the explode is gated on membership so non-matching docs are
    # dropped before any shuffle)
    per_doc = documents.select(
        F.col(id_col),
        F.size(words).cast("long").alias("dl"),
        F.filter(
            words, lambda w: w.isin(*terms) if len(terms) > 1 else w == terms[0]
        ).alias("hits"),
    )
    # round 6: per_doc feeds the corpus stats AND the tf table — without
    # materialization the membership filter re-scans the corpus per branch
    per_doc = per_doc.localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    tf = (
        per_doc.filter(F.size("hits") > 0)
        .select(id_col, "dl", F.explode("hits").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_t = tf.groupBy("term").agg(F.countDistinct(id_col).cast("long").alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * F.lit(float(_MICRO))
        )
        .cast("long")
        .alias("idf_micro"),
        "n_docs",
        "total_tokens",
    )
    # dl·N/T in ONE double division of exact integers — both engines
    # evaluate the identical IEEE expression tree
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * (F.col("dl") * F.col("n_docs")) / F.col("total_tokens")
    )
    contrib = F.round(
        F.col("idf_micro")
        * (F.col("tf") * F.lit(float(k1 + 1.0)))
        / (F.col("tf") + norm)
    ).cast("long")
    scored = (
        tf.join(F.broadcast(idf), "term")
        .select(id_col, contrib.alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("score_micro"),
            F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        )
    )
    return (
        scored.orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
        .limit(int(topk))
    )

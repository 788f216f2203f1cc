"""Byte-pair-encoding tokenizer training (Sennrich, Haddow & Birch,
ACL 2016) over the corpus — the vocabulary-construction pass a training
pipeline runs before it can count a single token.

Why this fits Spark: BPE training never needs the corpus after the
first scan. ONE word-frequency aggregation collapses 100 TB of text
into a vocabulary-sized (word, count) table, and every merge iteration
is an adjacent-pair count + argmax + segmentation rewrite over THAT
table — the same compact-iterate shape as the k-means trainer
(simsearch.train_centroids_kmeans), with the same discipline: zero
`.collect()` (the winning pair is a one-row broadcast), one
localCheckpoint per iteration to truncate lineage, and a fully
deterministic argmax (count desc, then lexicographic pair) so two
engines — or two cluster runs — pick identical merges.

Segmentation state is a SENTINEL-DELIMITED string: each piece is
wrapped in \\x1f, so a word's pieces look like
``\\x1f l \\x1f\\x1f o \\x1f\\x1f w \\x1f\\x1f </w> \\x1f`` (spaces for
illustration). Applying merge (l, r) is then ONE literal
string-replace of ``\\x1f l \\x1f\\x1f r \\x1f`` with ``\\x1f lr \\x1f``:
occurrences are character-DISJOINT (unlike space-joined pieces, where
"a a a a" shares the middle space and a plain replace would miss the
second merge), so left-to-right non-overlapping replace — the exact
semantics of both Spark's `replace` and DuckDB's — reproduces the
greedy merge of the reference implementation, and RE2's missing
lookarounds never matter because no regex is involved. Pieces may not
contain \\x1f (a non-printing control char; crawl pipelines strip it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = r"\s+"
EOW = "</w>"
_S = "\x1f"  # piece sentinel
_SS = _S + _S


def word_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """The single corpus scan: (word, cnt). Everything after this is
    vocabulary-sized."""
    return (
        documents.select(
            F.explode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _initial_seg(word_col):
    """chars + end-of-word marker, sentinel-wrapped."""
    return F.concat(
        F.lit(_S),
        F.array_join(F.split(word_col, ""), _SS),
        F.lit(_SS + EOW + _S),
    )


def _pieces(seg_col):
    """Strip the single outer sentinels, split on the double ones."""
    inner = seg_col.substr(F.lit(2), F.length(seg_col) - 2)
    return F.split(inner, _SS)


def _top_pair(seg: DataFrame) -> DataFrame:
    """One-row DataFrame with the iteration's winning pair: max count,
    ties broken lexicographically — min(struct(-cnt, l, r)), a plain
    aggregate (total order, no window, no collect)."""
    pcs = _pieces(F.col("seg"))
    # a fully-merged word has ONE piece — guard before sequence(1, 0)
    # would go descending (same rule as textqc.bigram_logprob)
    adj = F.when(
        F.size(pcs) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(pcs) - 1),
            lambda i: F.struct(
                F.element_at(pcs, i).alias("l"),
                F.element_at(pcs, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    pairs = seg.select("cnt", F.explode(adj).alias("p"))
    agg = pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("cnt").cast("long").alias("pair_cnt")
    )
    return agg.agg(
        F.min(
            F.struct((-F.col("pair_cnt")).alias("nc"), F.col("l"), F.col("r"))
        ).alias("t")
    ).select(
        F.col("t.l").alias("l"),
        F.col("t.r").alias("r"),
        (-F.col("t.nc")).cast("long").alias("pair_cnt"),
    )


def _apply_merge(seg: DataFrame, top: DataFrame) -> DataFrame:
    """Rewrite every segmentation with the winning pair fused: a one-row
    broadcast and ONE literal string replace (see module docstring for
    why the sentinel layout makes this exactly the greedy merge)."""
    return seg.crossJoin(
        F.broadcast(top.select(F.col("l").alias("_l"), F.col("r").alias("_r")))
    ).select(
        "word",
        "cnt",
        F.replace(
            F.col("seg"),
            F.concat(F.lit(_S), F.col("_l"), F.lit(_SS), F.col("_r"), F.lit(_S)),
            F.concat(F.lit(_S), F.col("_l"), F.col("_r"), F.lit(_S)),
        ).alias("seg"),
    )


def _train(documents: DataFrame, n_merges: int, text_col: str):
    """Shared loop: returns (final segmentation table, merge table)."""
    wc = word_counts(documents, text_col=text_col)
    seg = wc.select("word", "cnt", _initial_seg(F.col("word")).alias("seg"))
    merges = None
    for it in range(int(n_merges)):
        seg = seg.localCheckpoint()  # one compact table per iteration
        top = _top_pair(seg)
        seg = _apply_merge(seg, top)
        mrow = top.select(
            F.lit(it).cast("long").alias("it"),
            "l",
            "r",
            F.concat("l", "r").alias("merged"),
            "pair_cnt",
        )
        merges = mrow if merges is None else merges.unionAll(mrow)
    return seg, merges


def train_bpe(
    documents: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Learn `n_merges` BPE merges; returns the ordered merge table
    (it, l, r, merged, pair_cnt) — n_merges rows, the artifact a
    tokenizer ships.

    Per iteration: explode adjacent piece pairs weighted by word count
    (ONE pair-keyed hash agg, map-side combinable), argmax as a one-row
    aggregate, broadcast it, one literal replace. The corpus is never
    touched again after word_counts; at 100 TB each iteration moves a
    vocabulary-sized narrow table, nothing else.
    """
    _, merges = _train(documents, n_merges, text_col)
    return merges


def bpe_segment(
    documents: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Train and apply: one row per distinct word with its final piece
    array and piece count — the encode table a tokenizer joins against
    the corpus (id-keyed; the corpus text itself is never re-shuffled)."""
    seg, _ = _train(documents, n_merges, text_col)
    pcs = _pieces(F.col("seg"))
    return seg.select(
        "word",
        "cnt",
        pcs.alias("pieces"),
        F.size(pcs).cast("long").alias("n_pieces"),
    )

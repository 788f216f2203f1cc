"""Text-quality / provenance operators for large-scale training-data
pipelines (round 5 additions beyond the reference surface).

Three operators a 100 TB curation pipeline runs on every document, all
pure JVM-side expressions (no Python in the hot path, no UDFs):

  - n-gram repetition statistics (the Gopher / MassiveText "repetitive
    document" signal: what fraction of a document is its single most
    common word n-gram) — explode + two hash aggregations, both
    map-side combinable;
  - PII detection + redaction (email / IPv4 / E.164-ish phone) —
    regexp_extract_all counts and a chained regexp_replace, one narrow
    projection, zero shuffle;
  - winnowing fingerprints (Schleimer/Wilkerson/Aiken MOSS selection:
    k-token shingles → rolling hash → min per w-window → distinct) —
    computed entirely INSIDE per-row array expressions via higher-order
    functions, so the only shuffle is whatever the caller does with the
    (doc_id, fingerprint) pairs afterwards.

Scale notes: repetition's explode produces n_tokens rows per doc but the
(doc_id, ngram) count is a partial-agg hash aggregation — no skew beyond
document length, which the corpus bounds. PII and winnowing are
shuffle-free per-row transforms. All three use the PORTABLE md5 hash
variant where hashing is needed (see dedup._seeded_hash) so DuckDB can
replay results bit-identically for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = r"\s+"

# PII patterns — kept to the common subset of Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookaround, explicit classes only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PHONE_RE = r"\+\d{9,15}"


def _words(text_col: str):
    return F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)


def ngram_repetition(
    documents: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram repetition statistics (Gopher-style filter).

    Returns one row per input document:
      top_ngram_count    occurrences of the most frequent word n-gram
      n_ngrams           total n-grams in the document
      n_distinct_ngrams  distinct n-grams
      is_repetitive      1 when the top n-gram covers ≥ 20% of all
                         n-grams (top*5 >= total, integer math), else 0

    Documents with fewer than n tokens get zeros and is_repetitive=0.

    Physical shape: explode(n-grams) → hash-agg on (doc_id, ngram) →
    hash-agg on doc_id, then a left join back to the id spine so short
    documents survive. Both aggregations partial-combine map-side; the
    join key is the document id (unskewed by construction).
    """
    words = _words(text_col)
    n_tokens = F.size(words)
    # element_at is 1-based; sequence ascends only when stop >= start,
    # so gate on n_tokens >= n to avoid a descending sequence.
    idx = F.sequence(F.lit(1), n_tokens - (n - 1))
    ngrams = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i, n), " ")
    )
    ngrams = F.when(n_tokens >= n, ngrams).otherwise(
        F.array().cast("array<string>")
    )
    exploded = documents.select(
        F.col(id_col), F.explode(ngrams).alias("ngram")
    )
    per_ngram = exploded.groupBy(id_col, "ngram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = per_ngram.groupBy(id_col).agg(
        F.max("cnt").cast("long").alias("top_ngram_count"),
        F.sum("cnt").cast("long").alias("n_ngrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_ngrams"),
    )
    spine = documents.select(id_col)
    out = spine.join(per_doc, id_col, "left")
    zero = F.lit(0).cast("long")
    return out.select(
        F.col(id_col),
        F.coalesce("top_ngram_count", zero).alias("top_ngram_count"),
        F.coalesce("n_ngrams", zero).alias("n_ngrams"),
        F.coalesce("n_distinct_ngrams", zero).alias("n_distinct_ngrams"),
        F.when(
            (F.coalesce("n_ngrams", zero) > 0)
            & (F.coalesce("top_ngram_count", zero) * 5 >= F.coalesce("n_ngrams", zero)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_repetitive"),
    )


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Detect and redact common PII (emails, IPv4 addresses, +-prefixed
    phone numbers) in one narrow shuffle-free projection.

    Returns (id, n_emails, n_ipv4, n_phones, redacted_hash) where
    redacted_hash is md5 of the text after replacing every match with a
    typed placeholder — emails first, then IPs, then phones, so counts
    are taken on the ORIGINAL text and the replacement order is part of
    the contract (an email's host part can otherwise be re-matched).

    A real deployment keeps the redacted text column; the driver query
    hashes it only so the oracle compares a scalar.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    )


def winnowing_fingerprints(
    documents: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al., SIGMOD'03 —
    the MOSS algorithm): hash every k-token shingle, slide a window of w
    consecutive hashes, keep the minimum of each window, emit the
    distinct selected hashes as (doc_id, fingerprint) rows.

    Guarantees: any shared run of w+k-1 tokens between two documents
    yields at least one shared fingerprint, while storing only ~2/(w+1)
    of all shingle hashes — the standard local-sampling contract that
    makes plagiarism/near-dup detection index-sized instead of
    corpus-sized.

    The entire selection runs inside per-row array expressions
    (transform/slice/array_min/array_distinct) — whole-stage codegen,
    zero shuffle; the downstream inverted index (groupBy fingerprint) is
    the caller's choice. hash_fn follows dedup._seeded_hash: "md5" is
    the portable 60-bit variant DuckDB replays; "xxhash64" would be the
    fast engine default but a per-element xxhash64 is not available
    inside array lambdas, so md5 is also the default here.

    Documents with fewer than k+w-1 tokens produce no rows (no full
    window exists), matching the reference algorithm's domain.
    """
    if hash_fn != "md5":
        raise ValueError("winnowing_fingerprints supports the portable md5 hash only")
    words = _words(text_col)
    n_tokens = F.size(words)
    n_shingles = n_tokens - (k - 1)
    shingle_hash = lambda i: F.conv(  # noqa: E731
        F.substring(F.md5(F.array_join(F.slice(words, i, k), " ")), 1, 15), 16, 10
    ).cast("long")
    hashes = F.when(
        n_shingles >= w, F.transform(F.sequence(F.lit(1), n_shingles), shingle_hash)
    ).otherwise(F.array().cast("array<long>"))
    # materialize the hash array as its own projected column: a Project
    # column evaluates ONCE per row, whereas inlining `hashes` into the
    # window lambda below would re-hash every shingle per window — an
    # O(n_shingles × w) md5 multiplier in the hot path
    hashed = documents.select(F.col(id_col), hashes.alias("_h"))
    h = F.col("_h")
    # round 6: the window minimum is least(h[j-1..j+w-2]) via w direct
    # element reads — the old array_min(slice(h, j, w)) allocated and
    # copied a w-element array PER WINDOW (n_shingles allocations per
    # document); `least` over non-null longs is the identical minimum
    win_min = (
        (lambda j: F.get(h, j - 1))
        if w == 1
        else (lambda j: F.least(*[F.get(h, j - 1 + i) for i in range(w)]))
    )
    mins = F.transform(F.sequence(F.lit(1), F.size(h) - (w - 1)), win_min)
    selected = F.when(F.size(h) >= w, F.array_distinct(mins)).otherwise(
        F.array().cast("array<long>")
    )
    return hashed.select(F.col(id_col), F.explode(selected).alias("fingerprint"))


def term_stats(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 1,
) -> DataFrame:
    """Corpus-level inverted term statistics: one row per distinct term
    with (doc_freq, collection_freq, max_tf) — the exact-integer core of
    vocabulary building, IDF weighting, and data-driven stopword
    discovery over a crawl corpus.

    Physical shape: explode(tokens) → hash-agg on (doc, term) → hash-agg
    on term. Both stages partial-combine map-side; the second shuffle
    keys on the term, whose natural skew (stopwords) is exactly what the
    per-(doc,term) pre-aggregation bounds — a term's row count after
    stage 1 is its doc_freq, not its collection_freq, so the hot "the"
    key carries n_docs rows, not n_tokens.
    """
    toks = documents.select(
        F.col(id_col), F.explode(_words(text_col)).alias("term")
    )
    per_doc = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    out = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum("tf").cast("long").alias("collection_freq"),
        F.max("tf").cast("long").alias("max_tf"),
    )
    if min_doc_freq > 1:
        out = out.filter(F.col("doc_freq") >= min_doc_freq)
    return out


def tfidf_vectors(
    documents: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashed TF-IDF document vectors (the hashing trick of
    Weinberger et al. 2009) — the vectorization stage that turns a text
    corpus into fixed-dimension sparse vectors for downstream similarity
    / clustering / dedup, with no driver-side vocabulary state.

    Sparse output: one row per (doc, bucket) with a non-degenerate
    weight — (doc_id, bucket, w_micro). Weights are EXACT integers
    ("micro" = ×1e6): idf_micro = round((ln((N+1)/(df+1)) + 1) · 1e6)
    is rounded ONCE per distinct doc-frequency (sklearn's smooth-idf
    formula), then every downstream step — tf multiply, signed bucket
    sum — is pure BIGINT arithmetic. Integer sums are associative-order
    independent, so Spark's partial aggregation and a serial oracle scan
    produce identical bits (the same determinism contract as the
    k-means quantized means); the only fp op in the whole operator is
    that one ln, quantized at 1e-6 where engines' libm agree to ~1e-10.

    Term→bucket and term→sign come from md5 (bucket: first 15 hex chars
    mod dim; sign: parity of hex char 16), so the mapping is portable
    across engines and restarts. Scale: two map-side-combinable hash
    aggs (doc×term tf, then doc×bucket sum) plus a one-row broadcast
    for the doc count. The idf join is NOT broadcast-hinted: its row
    count is the vocabulary, which on real web text (typos, ids, junk
    tokens) outgrows any broadcast budget — AQE broadcasts it when
    small and shuffles on `term` otherwise, where per-term fan-out is
    bounded by doc_freq (the same stopword-skew bound term_stats
    documents).
    """
    toks = documents.select(F.col(id_col), F.explode(_words(text_col)).alias("term"))
    # round 6: tf feeds both the doc-frequency table and the scoring join;
    # exchange reuse does not cross the broadcast boundary (the dsir
    # finding), so materialize the (doc, term) table once
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = df_.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.round(
            (
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1.0)
            )
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("idf_micro"),
        F.pmod(F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long"), F.lit(dim))
        .cast("long")
        .alias("bucket"),
        F.when(
            F.conv(F.substring(F.md5("term"), 16, 1), 16, 10).cast("long") % 2 == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("sign"),
    )
    return (
        tf.join(idf, "term")
        .groupBy(id_col, "bucket")
        .agg(
            F.sum(F.col("sign") * F.col("tf") * F.col("idf_micro"))
            .cast("long")
            .alias("w_micro")
        )
    )


def unigram_logprob(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram log-probability — the perplexity-proxy
    quality signal of CCNet-class pipelines (score each doc under a
    language model; the honest stand-in without a trained LM is the
    corpus's own unigram model). Gibberish and rare-token spam score
    far more negative per token than fluent text.

    Exact-integer contract (the tfidf_vectors pattern): the ONLY fp op
    is one ln per DISTINCT term — lp_micro = round(ln(cf/total)·1e6) —
    after which the per-doc score is a pure BIGINT sum of tf·lp_micro,
    so Spark partial aggregation and a serial oracle scan agree bit for
    bit.

    Skew: the hot join key is the term, but the left side is the
    (doc, term) tf table — a stopword's fan-out is its doc_freq, never
    its collection_freq (same bound as term_stats). Returns
    (doc_id, n_tokens, logprob_micro); consumers derive the per-token
    average as logprob_micro / (n_tokens·1e6).
    """
    toks = documents.select(F.col(id_col), F.explode(_words(text_col)).alias("term"))
    # round 6: same two-consumer materialization as tfidf_vectors
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").alias("total"))
    lp = cf.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(F.log(F.col("cf") / F.col("total")) * F.lit(1_000_000.0))
        .cast("long")
        .alias("lp_micro"),
    )
    return (
        tf.join(lp, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lp_micro")).cast("long").alias("logprob_micro"),
        )
    )


def bigram_logprob(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document CONDITIONAL bigram log-probability under the
    corpus's own add-one-smoothed bigram model — the step up from
    `unigram_logprob` that actually penalizes scrambled word ORDER, not
    just rare words:  lp(w_i | w_{i-1}) = ln((c(w_{i-1} w_i) + 1) /
    (c(w_{i-1}) + V)) summed over the document's bigram positions
    (V = distinct unigram vocabulary; Laplace smoothing keeps unseen
    transitions finite). A shuffled fluent document keeps its unigram
    score but collapses here — the signal CCNet-class filters want from
    a real LM, computed with nothing but the corpus.

    Exact-integer contract (the unigram_logprob pattern): ONE ln per
    DISTINCT bigram type — lp_micro = round(ln((bc+1)/(uc+V))·1e6) —
    after which every per-doc score is a pure BIGINT sum of
    tf·lp_micro, associative-order independent across engines.

    Skew: both model tables pre-aggregate per (doc, gram) first, so a
    hot bigram's join fan-out is its doc_freq, and the predecessor-count
    join keys on the bigram's FIRST token with the same bound. Returns
    (doc_id, n_bigrams, logprob2_micro); docs with < 2 tokens get no
    bigrams and are absent (callers left-join the doc spine if they
    need zeros — same domain rule as winnowing).
    """
    words = _words(text_col)
    n_tokens = F.size(words)
    grams = F.when(
        n_tokens >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tokens - 1),
            lambda i: F.array_join(F.slice(words, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_bi = (
        documents.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("tf"))
        # round 6: feeds the bigram-count model AND the scoring join —
        # materialized once (the dsir finding: no reuse across branches)
        .localCheckpoint(eager=False)
    )
    bc = doc_bi.groupBy("gram").agg(F.sum("tf").alias("bc"))
    toks = documents.select(F.explode(_words(text_col)).alias("term"))
    uc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("uc"))
    vocab = uc.agg(F.count(F.lit(1)).alias("v"))
    # the bigram's conditioning context is its first token; prefix
    # extraction is a projection, the join key stays the term
    lp = (
        bc.select(
            "gram",
            F.substring_index("gram", " ", 1).alias("term"),
            "bc",
        )
        .join(uc, "term")
        .crossJoin(F.broadcast(vocab))
        .select(
            "gram",
            F.round(
                F.log((F.col("bc") + F.lit(1.0)) / (F.col("uc") + F.col("v")))
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        doc_bi.join(lp, "gram")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("lp_micro")).cast("long").alias("logprob2_micro"),
        )
    )


def mix_report(
    documents: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Training-mix accounting: per-stratum document and token totals
    with each stratum's exact-integer share of the corpus —
    share_ppm = (n_tokens · 1e6) DIV total_tokens — the report every
    mix-rebalance decision (and every `stratified_sample` rate map)
    starts from.

    Physical shape: one narrow projection computing per-doc token
    counts (no explode — `size(split(...))` is a per-row expression),
    one map-side-combinable hash agg on the stratum, and a one-row
    broadcast for the total. Output is stratum-cardinality rows; at
    100 TB this is the cheapest full-corpus statement there is: a
    single scan that reads two columns.
    """
    per_doc = documents.select(
        F.col(strata_col).alias("stratum"),
        F.size(_words(text_col)).cast("long").alias("n_tokens"),
    )
    agg = per_doc.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    total = agg.agg(F.sum("n_tokens").alias("total_tokens"))
    return agg.crossJoin(F.broadcast(total)).select(
        "stratum",
        "n_docs",
        "n_tokens",
        # true BIGINT division (never a double in the middle): a fp
        # quotient like 123.99999999998 would truncate to the wrong ppm
        F.expr("n_tokens * 1000000L DIV total_tokens").alias("share_ppm"),
    )

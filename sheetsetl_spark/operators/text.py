"""Text-analysis operators (SURVEY §2-C C4): tokenization, quality
scoring, language-ID heuristic, fingerprinting, tf-idf.

All expressions are built-in SQL functions / higher-order array functions
(JVM-side, codegen'd) — the shape that survives a 100 TB corpus: one scan,
narrow projections, aggregations with map-side partials. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tiny function-word list used by the quality/stopword heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in")

#: Marker tokens for the n-gram language-ID heuristic. The fixture corpus
#: is synthetic word soup, so the rule is a deterministic stand-in for a
#: real character-n-gram classifier; the operator shape (per-doc scoring,
#: argmax over language models) is what scales.
LANG_MARKERS = (("en", "the"), ("es", "data"), ("fr", "table"), ("de", "row"), ("zh", "batch"))


def round6_bin(col: Column) -> Column:
    """Engine-portable 6-dp rounding of a double: FLOOR(x*1e6 + 0.5)/1e6
    operates on the BINARY value, identically in Spark and DuckDB.

    Plain ROUND diverges even on IDENTICAL doubles: Spark rounds the
    double's shortest decimal representation half-up (0.0001255 ->
    0.000126) while DuckDB rounds the binary value (same double is
    0.00012549999... -> 0.000125). Found twice by the randomized-fixture
    fuzz on per-document mean scores. The SQL twin must spell the same
    FLOOR form (ROUND6_BIN_SQL)."""
    return F.floor(col * 1000000.0 + 0.5) / 1000000.0


def round6_bin_sql(x: str) -> str:
    """DuckDB fragment mirroring :func:`round6_bin` exactly."""
    return f"FLOOR(({x}) * 1000000.0 + 0.5) / 1000000.0"


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokenizer (split stays JVM-side)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(col, " ")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: counts, distinct counts, average
    token length, stopword ratio (C4 quality-scoring inputs)."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.expr(f"size(filter(split({text_col}, ' '), t -> t IN ({stop_list})))")
    return docs.select(
        id_col,
        n_tok.cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col(text_col), " ", "")) / n_tok, 6
        ).alias("avg_token_len"),
        F.round(n_stop / n_tok, 6).alias("stopword_ratio"),
    )


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_stats: bool = False,
) -> DataFrame:
    """Deterministic quality score: length band + stopword presence +
    lexical diversity (distinct/total tokens). The standard pre-training
    filter shape — pure per-row arithmetic, embarrassingly parallel.

    ``with_stats`` additionally emits (n_tokens, n_chars) from the same
    projection — consumers that need the score AND size stats (the c36
    decile calibration) read them in one scan instead of re-deriving the
    formula (single source: a drifted copy would bin documents against a
    different score than the one c20 filters on)."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    diversity = F.size(F.array_distinct(toks)) / n_tok
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    has_stop = F.expr(
        f"size(filter(split({text_col}, ' '), t -> t IN ({stop_list}))) > 0"
    ).cast("int")
    length_ok = (F.length(text_col).between(100, 5000)).cast("int")
    score = F.round(0.4 * length_ok + 0.3 * has_stop + 0.3 * diversity, 6)
    cols = [F.col(id_col), F.col("lang"), score.alias("quality")]
    if with_stats:
        cols += [
            n_tok.alias("n_tokens"),
            F.length(text_col).alias("n_chars"),
        ]
    return docs.select(*cols)


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: first matching marker token wins (C4).
    Deterministic CASE cascade -> fully oracle-checkable."""
    toks = tokens(text_col)
    pred = F.lit("unknown")
    for lang, marker in reversed(LANG_MARKERS):
        pred = F.when(F.array_contains(toks, marker), lang).otherwise(pred)
    return docs.select(id_col, F.col("lang").alias("actual_lang"), pred.alias("predicted_lang"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (C4). Exact-dup
    detection at scale = groupBy(fingerprint) — shuffle on a 16-byte key
    instead of the full document payload."""
    return docs.select(
        id_col,
        F.col("source"),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("fp"),
    )


def tf_idf_top_terms(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k terms per document by tf-idf (C4).

    tf = term_count / doc_len; idf = ln(N / df). Everything is exact
    integer counting until the final float formula, so ranking is
    deterministic (ties broken by term). Two shuffles total: term counts,
    then document frequencies (broadcast back — df table is vocabulary-
    sized, tiny next to the corpus)."""
    from pyspark.sql import Window

    term_rows = docs.select(
        id_col, tokens(text_col).alias("__toks")
    ).select(
        id_col, F.explode("__toks").alias("term"), F.size("__toks").alias("doc_len")
    )
    tf = term_rows.groupBy(id_col, "term", "doc_len").agg(F.count("*").alias("term_cnt"))
    # N enters as a broadcast one-row aggregate, not a docs.count() driver
    # action — that action cost a whole extra scan of the corpus before
    # the real job even started.
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    # df per term as COUNT(*) over a term-partitioned window: tf is keyed
    # by (doc, term), so the frame size IS the distinct-doc count. One
    # evaluation of tf and one term shuffle, vs the aggregate-then-join
    # form's two of each (the r6 c45 lesson). Spill-safe at corpus scale:
    # a stop-word's window group is df rows in the (disk-backed) window
    # buffer — no collect_set, and no vocabulary-sized broadcast.
    wterm = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count("*").over(wterm))
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                (F.col("term_cnt") / F.col("doc_len"))
                * F.log(F.col("__n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


#: GPT-2-ish pre-tokenizer, reduced to syntax RE2 and java.util.regex
#: treat identically (letter runs | single digits | single punctuation) so
#: the Spark plan and the DuckDB oracle tokenize bit-identically.
BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def bpe_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4 token counting, BPE-ish tier: counts sub-word-style regex tokens
    next to whitespace tokens (the ratio approximates tokens-per-word
    inflation a real BPE tokenizer would report). One scan, no shuffle."""
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    ws = tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.size(bpe).cast("int").alias("n_bpe_tokens"),
        F.size(ws).cast("int").alias("n_ws_tokens"),
        F.round(F.size(bpe) / F.size(ws), 6).alias("tokens_per_word"),
    )


#: Email shape kept to syntax RE2 (DuckDB) and java.util.regex agree on.
EMAIL_PATTERN = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"


def redact_pii(
    docs: DataFrame,
    pattern: str = EMAIL_PATTERN,
    replacement: str = "[REDACTED]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4 PII scrubbing: regex redaction with a per-doc hit count (the
    audit column a compliance pipeline needs). One scan, JVM-side regex."""
    hits = F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0))
    return docs.select(
        F.col(id_col),
        F.regexp_replace(F.col(text_col), pattern, replacement).alias("redacted_text"),
        hits.cast("int").alias("n_redactions"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token-window chunks (the
    pre-training chunking step: window of ``chunk_tokens``, advancing
    ``stride`` tokens, so consecutive chunks overlap by
    chunk_tokens - stride). Pure array functions — sequence over start
    offsets, slice per offset, one explode; no UDF, no shuffle.

    Tokenization is projected into a column BEFORE the transform: a
    split() expression referenced inside the slice lambda re-splits the
    document per chunk offset (O(tokens²/stride) string work per doc)."""
    tokenized = docs.select("*", tokens(text_col).alias("__toks"))
    n = F.size(F.col("__toks"))
    # start offsets 1, 1+stride, ... while start <= n (last partial chunk kept)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(F.col("__toks"), s, chunk_tokens))
    exploded = tokenized.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_toks"),
    ).filter(F.size("chunk_toks") > 0)
    return exploded.select(
        id_col,
        "chunk_idx",
        F.array_join("chunk_toks", " ").alias("chunk_text"),
        F.size("chunk_toks").cast("int").alias("n_tokens"),
    )


#: Engine-portable URL shape: scheme + host; simple enough that RE2 and
#: java.util.regex agree character-for-character.
URL_PATTERN = "https?://([A-Za-z0-9.-]+)"


def url_domain_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-domain corpus stats from URLs embedded in document text (C4):
    (domain, n_urls, n_docs). The first step of domain-level curation —
    blocklist filtering, per-domain quality priors, crawl dedup.

    regexp_extract_all + explode keeps extraction JVM-side and one pass;
    the aggregation is vocabulary-sized (domains), so map-side combine
    collapses the corpus before the single shuffle. At 100 TB the output
    is still just the domain table — join it back broadcast for
    per-document filtering (see domain_blocklist_filter)."""
    urls = docs.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 1)).alias(
            "domain"
        ),
    )
    return urls.groupBy("domain").agg(
        F.count("*").alias("n_urls"), F.countDistinct(id_col).alias("n_docs")
    )


def domain_blocklist_filter(
    docs: DataFrame,
    blocked_domains: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop every document containing a URL whose domain is blocklisted.
    The blocklist is list-sized -> broadcast anti-join; the corpus never
    shuffles."""
    doc_domains = docs.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 1)).alias(
            "domain"
        ),
    )
    hit = doc_domains.join(F.broadcast(blocked_domains), "domain").select(id_col).distinct()
    return docs.join(hit, id_col, "left_anti")


def heavy_hitters(
    docs: DataFrame,
    min_frac: float = 0.005,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokens whose corpus-wide frequency is at least ``min_frac`` of all
    tokens (C4): (token, cnt, frac). Exact — the vocabulary after
    map-side combine is tiny relative to the corpus, so the exact
    formulation beats a sketch until the vocabulary itself stops fitting
    (then swap the groupBy for count_min_sketch and keep the same
    contract). The total is re-aggregated from the vocabulary-sized count
    table — the scan+partial-agg subtree is shared with the main branch,
    so ReuseExchange folds both into ONE pass over the corpus (and it is
    a broadcast one-row aggregate, not a driver-side count action)."""
    toks = docs.select(F.explode(tokens(text_col)).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.col("__total") * F.lit(min_frac))
        .select("token", "cnt", F.round(F.col("cnt") / F.col("__total"), 6).alias("frac"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval: top-k documents for a bag of query terms.

    Okapi BM25 with the +1 idf smoothing:
      idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
      tfnorm  = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
      score   = sum over query terms of round(idf * tfnorm, 6)

    Scale shape: the token stream is FILTERED TO THE QUERY TERMS before
    the (doc, term) aggregate, so the per-term stats shuffle is
    proportional to query-term occurrences, not the corpus vocabulary;
    N/avgdl are a one-row broadcast aggregate (avgdl via exact decimal
    sum / count); per-term contributions are rounded then accumulated in
    decimal so the final sum is order-independent and hash-stable.

    Output: (id, score, n_matched) for the top-k by (score desc, id).
    """
    qlit = F.array(*[F.lit(t) for t in query_terms])
    term_rows = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("dl"),
        F.explode(tokens(text_col)).alias("term"),
    ).filter(F.array_contains(qlit, F.col("term")))
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.size(tokens(text_col)).cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avgdl"),
    )
    tf = term_rows.groupBy(id_col, "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    dfc = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfnorm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.round(idf * tfnorm, 6)
    scored = (
        tf.join(F.broadcast(dfc), "term")
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.sum(contrib.cast("decimal(18,6)")).cast("double").alias("score"),
            F.countDistinct("term").cast("int").alias("n_matched"),
        )
    )
    # Top-k via orderBy+limit so Catalyst plans TakeOrderedAndProject:
    # per-partition k-element heaps merged on the driver, no
    # single-partition Exchange. A row_number() over an unpartitioned
    # Window here would funnel every doc matching any query term through
    # one task — the classic 100-TB scale-killer (see SCALE.md, b36).
    # (id_col tiebreak keeps the k-th boundary deterministic.)
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "score", "n_matched")
    )


def _cms_buckets(width: int, depth: int) -> Column:
    """Per-token bucket array: bucket_i = md5-prefix-60bit("i:token") mod
    width — the engine-portable hash family shared with the DuckDB twin."""

    def p60(c: Column) -> Column:
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")

    return F.array(
        *[
            F.pmod(p60(F.concat_ws(":", F.lit(str(i)), F.col("token"))), F.lit(width))
            for i in range(depth)
        ]
    )


def cms_cells(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """The (depth, bucket, cnt) cell table of a count-min sketch over the
    corpus token stream — <= depth x width rows regardless of input.

    CMS is a LINEAR sketch: the cell table of a union of corpora is the
    cell-wise SUM of their tables, so incremental maintenance (the
    streaming SketchIngestForeachBatch) stores per-batch cells and
    merges by groupBy-sum with zero approximation drift vs a one-shot
    build."""
    toks = docs.select(F.explode(tokens(text_col)).alias("token"))
    cells = toks.select(F.posexplode(_cms_buckets(width, depth)).alias("depth", "bucket"))
    return cells.groupBy("depth", "bucket").agg(F.count("*").alias("cnt"))


def cms_probe_estimates(
    spark,
    sketch: DataFrame,
    probe_tokens: list[str],
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """(token, cms_est) for each probe against a (depth, bucket, cnt)
    sketch table: min over depth rows of the probed buckets."""
    probes = spark.createDataFrame([(t,) for t in probe_tokens], ["token"]).select(
        "token",
        F.posexplode(_cms_buckets(width, depth)).alias("depth", "bucket"),
    )
    return (
        F.broadcast(probes)
        .join(sketch, ["depth", "bucket"])
        .groupBy("token")
        .agg(F.min("cnt").alias("cms_est"))
    )


def count_min_sketch_estimates(
    docs: DataFrame,
    probe_tokens: list[str],
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Count-min sketch over the token stream, probed for known tokens.

    The sketch is a (depth × width) count table — bounded memory no
    matter the corpus size, which is the succession plan for
    :func:`heavy_hitters` once the vocabulary itself stops fitting in a
    shuffle. Build: each token increments one bucket per depth row
    (bucket_i = md5-prefix hash of "i:token" mod width); estimate:
    min over rows of the probed buckets — a biased-high estimator with
    error ≤ 2N/width at confidence 1 - (1/2)^depth.

    Hashing uses the engine-portable 60-bit md5-prefix family (same as
    the c2d audit path), so a DuckDB twin rebuilds the SKETCH ITSELF
    bit-for-bit and the whole approximate pipeline is hash-checkable.

    Build cost: one corpus scan, one (depth, bucket)-keyed aggregate
    whose output is ≤ depth × width rows regardless of input; probes
    join against that bounded table. Output:
    (token, exact_cnt, cms_est, overestimates) for probes present in the
    corpus — overestimates is the CMS guarantee est >= exact, checked
    per token in both engines.
    """

    toks = docs.select(F.explode(tokens(text_col)).alias("token"))
    sketch = cms_cells(docs, width=width, depth=depth, text_col=text_col)
    est = cms_probe_estimates(
        docs.sparkSession, sketch, probe_tokens, width=width, depth=depth
    )
    exact = (
        toks.filter(F.col("token").isin(probe_tokens))
        .groupBy("token")
        .agg(F.count("*").alias("exact_cnt"))
    )
    return exact.join(est, "token").select(
        "token",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_cnt")).cast("int").alias("overestimates"),
    )


def gopher_quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 12.0,
    min_stop_ratio: float = 0.05,
    min_distinct_ratio: float = 0.3,
) -> DataFrame:
    """Gopher/Dolma-style heuristic document filters (C4 curation tier):
    per-document rule flags plus the aggregate pass verdict.

    Rules (each an independent boolean so the curation report can show
    which rule rejected a document): word count in [min, max]; mean word
    length in [min, max]; stopword ratio >= threshold (real text contains
    function words); distinct-token ratio >= threshold (repetition fuse,
    the same signal as c10 at unigram granularity). Pure per-row
    arithmetic over the token array — one scan, zero shuffles,
    embarrassingly parallel at any corpus size."""
    toks = tokens(text_col)
    n = F.size(toks)
    mean_len = F.round(F.length(F.regexp_replace(F.col(text_col), " ", "")) / n, 6)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop_ratio = F.round(
        F.expr(f"size(filter(split({text_col}, ' '), t -> t IN ({stop_list})))") / n, 6
    )
    distinct_ratio = F.round(F.size(F.array_distinct(toks)) / n, 6)
    word_count_ok = n.between(min_words, max_words)
    mean_len_ok = mean_len.between(min_mean_len, max_mean_len)
    stop_ok = stop_ratio >= min_stop_ratio
    distinct_ok = distinct_ratio >= min_distinct_ratio
    return docs.select(
        F.col(id_col),
        n.cast("int").alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        word_count_ok.cast("int").alias("word_count_ok"),
        mean_len_ok.cast("int").alias("mean_len_ok"),
        stop_ok.cast("int").alias("stopword_ok"),
        distinct_ok.cast("int").alias("distinct_ok"),
        (word_count_ok & mean_len_ok & stop_ok & distinct_ok).cast("int").alias("passes"),
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram language-model surprise score (C4 quality tier): train a
    unigram model on the corpus itself, then score each document by its
    mean per-token negative log-probability — the cheap stand-in for the
    perplexity-filter step (CCNet's KenLM bucket) of a pre-training
    pipeline; low surprise = repetitive/common text, high = rare tokens.

    Determinism contract: each token type's -ln p is rounded to 6 dp
    FIRST, then weighted by the doc's term count and accumulated in exact
    DECIMAL, so the per-document sum is order-independent and matches the
    DuckDB twin bit-for-bit under any partitioning.

    Scale shape: (doc, term) counts shuffle once; the unigram model is
    vocabulary-sized (map-side combine collapses the corpus), joined back
    on term with no broadcast hint (AQE broadcasts while it fits); corpus
    token total enters as a broadcast one-row aggregate — no driver-side
    count action, no extra corpus scan (ReuseExchange folds the model and
    total branches into the same partial-aggregate pass)."""
    term_rows = docs.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        id_col, F.explode("__toks").alias("term"), F.size("__toks").alias("doc_len")
    )
    tf = term_rows.groupBy(id_col, "term", "doc_len").agg(F.count("*").alias("cnt"))
    model = tf.groupBy("term").agg(F.sum("cnt").alias("g_cnt"))
    total = model.agg(F.sum("g_cnt").alias("__total"))
    neg_lp = round6_bin(-F.log(F.col("g_cnt") / F.col("__total")))
    contrib = (F.col("cnt") * neg_lp).cast("decimal(28,6)")
    return (
        tf.join(model, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col, "doc_len")
        .agg(F.sum(contrib).alias("__sum"))
        .select(
            id_col,
            F.col("doc_len").cast("int").alias("n_tokens"),
            round6_bin(F.col("__sum").cast("double") / F.col("doc_len")).alias(
                "avg_surprise"
            ),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-vocabulary coverage (C4): build the top-``vocab_size``
    corpus vocabulary (by frequency, ties broken by token), then report
    each document's out-of-vocabulary token fraction — the signal that
    decides whether a tokenizer's vocab fits a corpus before a training
    run prices it in.

    The vocabulary is selected with a distributed top-k (orderBy + limit
    over the vocabulary-sized count table — never a one-partition window
    over the corpus) and joined back as a broadcast membership list; the
    per-document OOV count is a second aggregate over the token stream.
    """
    term_rows = docs.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        id_col, F.explode("__toks").alias("term"), F.size("__toks").alias("doc_len")
    )
    vocab = (
        term_rows.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "term")
        .limit(vocab_size)
        .select("term")
    )
    oov = (
        term_rows.join(F.broadcast(vocab), "term", "left_anti")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_oov"))
    )
    base = term_rows.groupBy(id_col, "doc_len").agg(F.count("*").alias("__n"))
    return (
        base.join(oov, id_col, "left")
        .select(
            id_col,
            F.col("doc_len").cast("int").alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("int").alias("n_oov"),
            F.round(
                F.coalesce(F.col("n_oov"), F.lit(0)) / F.col("doc_len"), 6
            ).alias("oov_ratio"),
        )
    )


def domain_mix_report(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus mix report (C4 curation): per-source document counts, token
    totals, and corpus shares — the table a data-mixing decision reads
    (and the input c19's weight computation starts from).

    One shuffle to the sources-sized aggregate; shares come from a
    broadcast one-row re-aggregate of that tiny table, so the corpus is
    scanned exactly once."""
    per = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("__docs"), F.sum("n_tokens").alias("__toks")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / F.col("__docs"), 6).alias("doc_share"),
        F.round(F.col("n_tokens") / F.col("__toks"), 6).alias("token_share"),
    )


def winnow_selected(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The winnowing selection itself: distinct selected fingerprints
    per document, as (id, n_grams, fp_pos, fp_hash) rows.

    See :func:`winnow_fingerprints` for the algorithm, portability, and
    scale notes; this is the reusable core (candidate generation for a
    local-fingerprint dedup join, and the surface the guarantee property
    test exercises)."""
    max_pos = 99_999_999
    toks = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast("bigint")
    key = F.concat(
        F.lpad(h.cast("string"), 19, "0"),
        F.lpad((F.lit(max_pos) - F.col("pos")).cast("string"), 8, "0"),
    )
    stream = docs.select(
        F.col(id_col),
        (F.size(toks) - k + 1).alias("n_grams"),
        F.posexplode(grams).alias("pos", "gram"),
    ).select(id_col, "n_grams", "pos", key.alias("key"))
    frame = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    selected = (
        stream.withColumn("wkey", F.min("key").over(frame))
        .filter(F.col("pos") <= F.col("n_grams") - w)
        .select(id_col, "n_grams", "wkey")
        .distinct()
    )
    return selected.select(
        id_col,
        "n_grams",
        (F.lit(max_pos) - F.substring("wkey", 20, 8).cast("int")).alias("fp_pos"),
        F.substring("wkey", 1, 19).cast("bigint").alias("fp_hash"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MOSS-style winnowing fingerprint statistics per document.

    Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD'03 — public
    algorithm) selects, from every window of ``w`` consecutive k-gram
    hashes, the minimum hash (rightmost position on ties). The selected
    set is a position-robust document sketch with two guarantees: any
    shared substring of >= w+k-1 tokens yields a shared fingerprint, and
    the expected density is 2/(w+1) of all grams. It is the
    local-fingerprinting complement to MinHash (c2b, a global sketch).

    Engine-portable argmin: rightmost-min-of-window needs an argmin with
    a POSITION tiebreak, which neither engine's MIN exposes directly.
    Both sides therefore order by one sort key string,
    ``lpad(hash, 19) || lpad(MAX_POS - pos, 8)`` — zero-padded decimal
    digits compare like numbers, and inverting pos makes the
    lexicographic MIN pick the *largest* position among equal hashes.
    One MIN over a rows-following frame per window start; distinct keys
    are the fingerprints. Hashes are the 60-bit md5-prefix family
    (same as count_min_sketch_estimates), bit-identical in DuckDB.

    Scale shape: one explode of the gram stream, ONE shuffle (window
    partitioned by document), a distinct bounded by selected
    fingerprints (~2/(w+1) of grams), and a per-document aggregate.
    Nothing is corpus-global; documents winnow independently.

    Output: (id, n_grams, n_windows, n_fingerprints, n_distinct_hashes,
    fp_density) for documents with at least one full window; density is
    fingerprints / windows, rounded to 6 dp.
    """
    selected = winnow_selected(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    return (
        selected.select(id_col, "n_grams", "fp_hash")
        .groupBy(id_col, "n_grams")
        .agg(
            F.count("*").cast("int").alias("n_fingerprints"),
            F.countDistinct("fp_hash").cast("int").alias("n_distinct_hashes"),
        )
        .select(
            id_col,
            F.col("n_grams").cast("int").alias("n_grams"),
            (F.col("n_grams") - w + 1).cast("int").alias("n_windows"),
            "n_fingerprints",
            "n_distinct_hashes",
            F.round(
                F.col("n_fingerprints") / (F.col("n_grams") - w + 1), 6
            ).alias("fp_density"),
        )
    )


def bpe_merge_candidates(
    docs: DataFrame,
    top: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The statistic one BPE merge round maximizes: adjacent
    character-pair frequencies over the corpus vocabulary, weighted by
    word occurrence (Sennrich et al., ACL'16 — public algorithm). The
    top pair is the next merge a tokenizer trained on this corpus would
    learn; the table is the induction step's whole input.

    Scale shape: the corpus collapses to its VOCABULARY first (one
    map-side-combining groupBy over the token stream), so the pair
    explosion runs over distinct words x word length, not corpus
    tokens — the same vocabulary-sized intermediate as tf-idf (c4e).
    Top-N via TakeOrderedAndProject.

    Output: (pair, occurrences, n_words) for the ``top`` most frequent
    pairs, ties broken by pair text.
    """
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcnt"))
        .filter(F.length("word") >= 2)
    )
    pair_stream = words.select(
        "word",
        "wcnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.length("word") - 2),
                lambda i: F.col("word").substr(i + 1, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pair_stream.groupBy("pair")
        .agg(
            F.sum("wcnt").alias("occurrences"),
            F.countDistinct("word").cast("int").alias("n_words"),
        )
        .orderBy(F.col("occurrences").desc(), F.col("pair"))
        .limit(top)
    )


def _bpe_clean(text_col: str, max_chars: int) -> Column:
    """Lowercase a-z stream, single spaces -> '_' word markers, first
    ``max_chars`` chars (the byte-level-BPE style pre-tokenization)."""
    col = F.lower(F.col(text_col))
    col = F.regexp_replace(col, "[^a-z ]", "")
    col = F.regexp_replace(col, " +", " ")
    col = F.substring(F.trim(col), 1, max_chars)
    return F.replace(col, F.lit(" "), F.lit("_"))


def _adjacent_pair_stream(cur: DataFrame, toks_col: str = "toks") -> DataFrame:
    """(x, y) rows of adjacent token pairs from a space-joined token
    string (standard BPE pair statistics: overlapping occurrences all
    count, e.g. 'l l l' yields ('l','l') twice). The token array is
    projected ONCE in its own step so the split doesn't re-evaluate per
    pair expression."""
    return (
        cur.select(F.split(F.trim(toks_col), " ").alias("a"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(a) - 2),"
                    " i -> struct(a[i] AS x, a[i+1] AS y))"
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
    )


def bpe_train_apply(
    docs: DataFrame,
    rounds: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 120,
) -> DataFrame:
    """TRUE byte-pair-encoding training + tokenization (Sennrich et al.,
    ACL'16 — the public algorithm): ``rounds`` merge rounds, each
    recomputing corpus-wide adjacent-pair counts over the CURRENT
    tokenization and greedily merging the argmax pair (ties broken
    (count DESC, x, y) for engine portability). Contrast
    :func:`bpe_merge_candidates`, which only reports the FIRST round's
    candidate table — this one runs the actual induction loop.

    Scale shape — why this is the right distributed BPE: each round is
    one map-side-combining pair aggregation (tree-reduced to a single
    argmax row, the kmeans-centroid bounded-collect precedent:
    operators/similarity.py) followed by a corpus-parallel token-level
    merge application — the merge lives in the PLAN as two literals,
    never joined. Driver state per round is ONE row; rounds are fixed
    and small, so lineage stays bounded.

    Merge application is EXACT greedy left-to-right non-overlapping
    token pairing implemented as ONE ``regexp_replace`` pure map per
    round (r10; see :func:`_bpe_apply_merge`): Java's ``replaceAll`` IS
    greedy left-to-right non-overlapping matching, and a lookahead
    keeps the next site's leading space available so adjacent-site
    chains merge correctly ('banana' merging (a,n) yields
    [b, an, an, a], never [b, an, a, n, a]). No explode, no window,
    no re-concat — the selection it computes is property-tested
    equivalent to the streak-parity definition of greedy BPE
    (tests/test_text_bpe.py).

    Returns (id, toks, n_tokens) — the tokenized doc after ``rounds``
    merges. DuckDB twin: an unrolled per-round CTE chain (the c56
    pagerank precedent), hash-checking every round's merge choice AND
    every doc's final tokenization.
    """
    base = docs.select(
        F.col(id_col).alias("id"), _bpe_clean(text_col, max_chars).alias("clean")
    ).filter(F.length("clean") >= 2)
    cur = base.select(
        "id",
        F.concat(
            F.lit(" "), F.regexp_replace(F.col("clean"), "(.)", "$1 ")
        ).alias("toks"),
    )
    # Spread the cleaned corpus up front: the source may be one parquet
    # split (measured: the whole first pair-aggregation ran on a single
    # core, 8.2s of the job). Since r10 the merge application is a pure
    # map (no per-round window), so the spread buys parallelism for the
    # per-round pair aggregations and merge maps, not a reusable
    # partitioning — which is exactly widen_to_cores' contract (r11):
    # on the compact fixture it repartitions like the old
    # repartition(id) did, but a production corpus whose scan is
    # already wide passes through UNTOUCHED, saving one full corpus
    # shuffle per invocation that the unconditional repartition paid
    # for nothing. fanout ~ tokens/doc: the explode in the pair
    # aggregation multiplies per-row work by the token count.
    from sheetsetl_spark.operators.skew import widen_to_cores

    cur = widen_to_cores(cur, fanout=128)
    for _ in range(rounds):
        # Lazy localCheckpoint: the argmax action below materializes this
        # round's tokenization ONCE and truncates lineage, so round r+1
        # reads the stored blocks instead of replaying all r prior merge
        # applications from the source scan (without it the loop is
        # O(rounds²) corpus passes — measured 29s -> ~13s at sf0.1).
        # MEMORY_AND_DISK storage: spill-safe at corpus scale; the
        # ContextCleaner frees each round's blocks when the previous
        # frame is dropped (the operators/prefix.py precedent).
        cur = cur.localCheckpoint(eager=False)
        best = (
            _adjacent_pair_stream(cur)
            .groupBy("x", "y")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("x"), F.col("y"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        cur = _bpe_apply_merge(cur, best[0]["x"], best[0]["y"])
    return cur.select(
        "id",
        F.trim(F.col("toks")).alias("toks"),
        F.size(F.split(F.trim(F.col("toks")), " ")).cast("int").alias("n_tokens"),
    )


def _bpe_apply_merge(cur: DataFrame, x: str, y: str) -> DataFrame:
    """One greedy BPE merge (x, y) -> xy over (id, toks) token strings,
    exact left-to-right non-overlapping pairing (see bpe_train_apply).

    ONE regexp_replace — a pure codegen'd map, no explode, no window,
    no re-concat (r10; the prior implementation exploded to positions
    and computed streak-parity selection with two doc-keyed windows +
    a collect_list re-assembly per round, ~4 heavy operators x rounds).
    Java's replaceAll IS greedy left-to-right non-overlapping matching:
    after a match it resumes past the consumed text, which consumes the
    pair's second token exactly like BPE's greedy scan, and within an
    x == x run it takes offsets 0, 2, 4... — the same selection the
    streak-parity windows computed (equivalence property-tested over
    20k random token sequences, tests/test_text_bpe.py).

    The pattern leans on two invariants of the toks format: every token
    is PRECEDED by exactly one space (leading-space string), and tokens
    are [a-z_]+ (no regex metacharacters, nothing to quote). Matching
    " x y" with a (?=[ ]|$) LOOKAHEAD — instead of consuming a trailing
    space, the mistake the docstring used to warn about — keeps the
    next site's leading space available, so adjacent-site chains merge
    correctly ('banana' (a,n) -> [b, an, an, a]); the lookahead also
    anchors token END, so (a, n) never corrupts neighboring token 'na'.
    """
    return cur.withColumn(
        "toks", F.regexp_replace("toks", f" {x} {y}(?=[ ]|$)", f" {x}{y}")
    )


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: int = 1,
) -> DataFrame:
    """Bigram language-model score with add-k smoothing, trained on the
    corpus itself (the next rung above :func:`unigram_logprob`'s bag of
    words — word ORDER now matters, so templated/shuffled spam scores
    differently from fluent text even at identical unigram mix).

    For each adjacent word pair: -ln((c(w1,w2)+k) / (c(w1)+k*V)) with V
    the corpus vocabulary size; per-pair terms round to 6 dp FIRST and
    accumulate in exact DECIMAL (the registry determinism contract).

    Scale shape: the bigram model is corpus-derived, so it's joined back
    on the bigram key (no broadcast assumption — AQE decides), the
    unigram model on w1; V is a broadcast one-row aggregate. One pair
    shuffle + two model joins; nothing driver-side.
    """
    toks = tokens(text_col)
    pair_rows = docs.select(
        F.col(id_col).alias("id"), F.explode(_pairs_of(toks)).alias("p")
    ).select("id", F.col("p.x").alias("w1"), F.col("p.y").alias("w2"))
    doc_pairs = pair_rows.groupBy("id", "w1", "w2").agg(F.count("*").alias("cnt"))
    bigram = doc_pairs.groupBy("w1", "w2").agg(F.sum("cnt").alias("big_cnt"))
    unigram = docs.select(F.explode(toks).alias("w1")).groupBy("w1").agg(
        F.count("*").alias("uni_cnt")
    )
    vocab = unigram.agg(F.count("*").alias("__v"))
    neg_lp = round6_bin(
        -F.log(
            (F.col("big_cnt") + F.lit(add_k))
            / (F.col("uni_cnt") + F.lit(add_k) * F.col("__v"))
        )
    )
    contrib = (F.col("cnt") * neg_lp).cast("decimal(28,6)")
    return (
        doc_pairs.join(bigram, ["w1", "w2"])
        .join(unigram, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.sum("cnt").cast("int").alias("n_bigrams"),
            F.sum(contrib).alias("__sum"),
        )
        .select(
            F.col("id"),
            "n_bigrams",
            round6_bin(F.col("__sum").cast("double") / F.col("n_bigrams")).alias(
                "avg_bigram_surprise"
            ),
        )
    )


def _pairs_of(arr: Column) -> Column:
    """array<struct<x,y>> of adjacent pairs of an array column."""
    return F.transform(
        F.sequence(F.lit(0), F.size(arr) - 2),
        lambda i: F.struct(
            F.element_at(arr, i + 1).alias("x"), F.element_at(arr, i + 2).alias("y")
        ),
    )


def zipf_slope(
    docs: DataFrame, text_col: str = "text", top: int = 100
) -> DataFrame:
    """Zipf rank-frequency fit: OLS slope of ln(count) on ln(rank) over
    the ``top`` most frequent terms (natural language sits near -1;
    strong deviation flags machine-generated / templated / boilerplate
    corpora — a one-scalar corpus-health check beside c64's divergence).

    Determinism: ranks come from ROW_NUMBER with a term tie-break;
    ln(rank) and ln(count) round to 6 dp first, their products round
    again, and all five regression moments accumulate in exact DECIMAL
    over <= ``top`` rows, so the closed-form slope/intercept is
    bit-identical across engines.

    Scale: term counts are one map-side-combining aggregation; the
    regression runs over a top-N (TakeOrderedAndProject) — constant-size
    tail work.
    """
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(top)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("term"))
    ranked = counts.select(
        round6_bin(F.log(F.row_number().over(w).cast("double"))).alias("lx"),
        round6_bin(F.log(F.col("cnt").cast("double"))).alias("ly"),
    )
    dec = lambda c: c.cast("decimal(28,6)")  # noqa: E731
    m = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec(F.col("lx"))).cast("double").alias("sx"),
        F.sum(dec(F.col("ly"))).cast("double").alias("sy"),
        F.sum(dec(round6_bin(F.col("lx") * F.col("ly")))).cast("double").alias("sxy"),
        F.sum(dec(round6_bin(F.col("lx") * F.col("lx")))).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").cast("int").alias("n_terms"),
        round6_bin(slope).alias("zipf_slope"),
        round6_bin(
            (F.col("sy") - slope * F.col("sx")) / F.col("n")
        ).alias("zipf_intercept"),
    )


def word_dropout(
    docs: DataFrame,
    denom: int = 10,
    seed: str = "aug",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic word-dropout augmentation (the contrastive /
    robustness-training view generator): token i of doc d drops iff the
    md5-uniform of (seed, d, i, token) lands in bucket 0 of ``denom`` —
    a ~1/denom dropout rate that is REPRODUCIBLE on any cluster, any
    partitioning, any engine (the same 32-bit md5-prefix idiom as the
    shard/split family; a Spark RAND() here would be neither replayable
    nor oracle-checkable).

    One corpus scan, all array HOFs (filter over an indexed transform),
    no explode — the token stream never leaves its row. Docs whose
    every token drops (probability denom^-len) are excluded, matching
    the aggregate-twin semantics.

    Output: (id, aug_text, n_orig, n_kept).
    """
    kept = F.expr(
        f"filter(transform(split({text_col}, ' '), (t, i) -> named_struct("
        f"  't', t, "
        f"  'keep', cast(conv(substring(md5(concat('{seed}', ':', "
        f"     cast({id_col} as string), ':', cast(i + 1 as string), ':', t)),"
        f"     1, 8), 16, 10) as bigint) % {denom} != 0)), "
        f" s -> s.keep)"
    )
    return (
        docs.select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), " ")).alias("n_orig"),
            kept.alias("__kept"),
        )
        .filter(F.size("__kept") > 0)
        .select(
            id_col,
            F.array_join(
                F.transform(F.col("__kept"), lambda s: s["t"]), " "
            ).alias("aug_text"),
            F.col("n_orig").cast("long").alias("n_orig"),
            F.size("__kept").cast("long").alias("n_kept"),
        )
    )


def span_corruption(
    docs: DataFrame,
    grid: int = 5,
    span: int = 3,
    denom: int = 4,
    seed: str = "t5",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic T5-style span corruption: candidate spans start on
    a fixed grid (positions 1, 1+grid, 1+2*grid, ...), each start is
    masked iff its md5-uniform lands in bucket 0 of ``denom``, and a
    masked span covers ``span`` consecutive tokens (grid > span keeps
    spans non-overlapping BY CONSTRUCTION — no conflict resolution
    pass). The k-th masked span (in position order) becomes
    ``<extra_id_k>`` in the corrupted text; the target sequence is the
    usual sentinel-then-original-tokens concatenation.

    Shape: one explode of the token stream, per-doc keyed windows for
    sentinel numbering, two string_agg-style reassemblies — shuffles
    only on the doc key, deterministic under any partitioning (every
    aggregation is order-pinned by token position).

    Output: (id, corrupted, target, n_spans); docs with no masked span
    have corrupted == original text, target == '' and n_spans = 0.
    """
    if span > grid:
        raise ValueError(f"span={span} must not exceed grid={grid}")
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("__i0", "__w"),
    ).select(
        "__id", (F.col("__i0") + 1).alias("__i"), "__w"
    )
    off = (F.col("__i") - 1) % grid
    start = F.col("__i") - off
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col("__id").cast("string"),
                    start.cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    marked = toks.withColumn(
        "__s", F.when((off < span) & (h % denom == 0), start)
    )
    starts = (
        marked.filter(F.col("__i") == F.col("__s"))
        .select("__id", "__s")
        .withColumn(
            "__k",
            F.row_number().over(
                Window.partitionBy("__id").orderBy("__s")
            )
            - 1,
        )
    )
    joined = marked.join(starts, ["__id", "__s"], "left")
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("__k").cast("string"), F.lit(">")
    )
    corrupted_piece = F.when(F.col("__s").isNull(), F.col("__w")).when(
        F.col("__i") == F.col("__s"), sentinel
    )
    target_piece = F.when(
        F.col("__i") == F.col("__s"), F.concat(sentinel, F.lit(" "), F.col("__w"))
    ).when(F.col("__s").isNotNull(), F.col("__w"))
    ordered_join = lambda piece: F.array_join(
        F.transform(
            F.filter(
                F.array_sort(
                    F.collect_list(
                        F.when(piece.isNotNull(), F.struct("__i", piece.alias("p")))
                    )
                ),
                lambda s: s.isNotNull(),
            ),
            lambda s: s["p"],
        ),
        " ",
    )
    return joined.groupBy("__id").agg(
        ordered_join(corrupted_piece).alias("corrupted"),
        ordered_join(target_piece).alias("target"),
        F.countDistinct(F.when(F.col("__i") == F.col("__s"), F.col("__s")))
        .cast("long")
        .alias("n_spans"),
    ).select(F.col("__id").alias(id_col), "corrupted", "target", "n_spans")


def term_keyness(
    docs: DataFrame,
    in_a: Column,
    text_col: str = "text",
    min_count: int = 5,
    top: int = 50,
) -> DataFrame:
    """Dunning log-likelihood (G2) term keyness between two corpus
    slices (Dunning 1993) — the corpus-comparison report a curation
    pipeline reads to see WHAT changed between two crawls / sources
    before deciding whether the drift is boilerplate, spam, or topic:

        G2 = 2 * (a*ln(a/E_a) + b*ln(b/E_b)),
        E_a = N_a*(a+b)/(N_a+N_b),  E_b likewise

    where a/b are the term's token counts in slice A/B and N_a/N_b the
    slice token totals. PSI (x95) says THAT a distribution moved;
    keyness names the terms responsible, signed by direction.

    Scale shape: one token explode -> one (term, slice) hash aggregate
    -> one (term) aggregate; the two slice totals broadcast back as a
    one-row aggregate. Portability: each ln factor is 6dp-rounded
    before the integer-weighted combination (the x82/c70 rounded-log
    recipe), so both engines combine identical doubles.

    Output: top ``top`` terms by G2 (tie-break term), with counts and
    sign (+1 over-represented in A, -1 in B).
    """
    toks = docs.select(
        in_a.cast("long").alias("in_a"),
        F.explode(tokens(text_col)).alias("term"),
    )
    cells = toks.groupBy("term").agg(
        F.sum("in_a").cast("long").alias("a"),
        F.sum(F.lit(1) - F.col("in_a")).cast("long").alias("b"),
    )
    # cells feeds BOTH the totals aggregate and the keyness expression;
    # un-pinned, each consumer re-runs the corpus explode+aggregate
    # (two corpus scans — caught by the plan test). The lazy checkpoint
    # materializes the vocabulary-sized frame once.
    cells = cells.localCheckpoint(eager=False)
    totals = cells.agg(
        F.sum("a").cast("long").alias("na"), F.sum("b").cast("long").alias("nb")
    )
    t = cells.filter(F.col("a") + F.col("b") >= min_count).crossJoin(
        F.broadcast(totals)
    )
    cnt = F.col("a") + F.col("b")
    e_a = F.col("na").cast("double") * cnt / (F.col("na") + F.col("nb"))
    e_b = F.col("nb").cast("double") * cnt / (F.col("na") + F.col("nb"))
    l_a = round6_bin(F.log(F.col("a") / e_a))
    l_b = round6_bin(F.log(F.col("b") / e_b))
    g2 = round6_bin(
        F.lit(2.0)
        * (
            F.when(F.col("a") > 0, F.col("a") * l_a).otherwise(F.lit(0.0))
            + F.when(F.col("b") > 0, F.col("b") * l_b).otherwise(F.lit(0.0))
        )
    )
    sign = F.when(
        F.col("a").cast("double") * F.col("nb")
        > F.col("b").cast("double") * F.col("na"),
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        t.select(
            "term",
            F.col("a").alias("cnt_a"),
            F.col("b").alias("cnt_b"),
            sign.alias("direction"),
            g2.alias("g2"),
        )
        .orderBy(F.col("g2").desc(), "term")
        .limit(top)
    )

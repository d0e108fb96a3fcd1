"""Deduplication operators (SURVEY §2-C C1/C2): exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design: every variant reduces the pairwise-comparison space BEFORE
any join — exact dedup shuffles on a 16-byte hash; Jaccard/LSH only join
documents that share a shingle/band bucket (equi-joins Catalyst can
shuffle-partition), never a cross join. At 100 TB the band join is the
only O(candidate) stage and AQE's skew-join splits hot buckets.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window

from sheetsetl_spark.cache import scoped_persist
from sheetsetl_spark.operators.text import round6_bin
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, key_cols: list[str], order_cols: list[Column]) -> DataFrame:
    """C1: keyed dedup with deterministic winner (row_number over an
    explicit order — never dropDuplicates' arbitrary pick)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def shingles(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    spread_key: bool = False,
) -> DataFrame:
    """Distinct word n-gram shingles per document.

    Built with higher-order functions (transform/slice over the token
    array) — one pass, no UDF, explode only the shingle stream.

    ``max_df``: drop shingles whose document frequency exceeds the cap
    (standard near-dup practice — boilerplate shingles like license
    headers appear in millions of docs and contribute f² candidate pairs
    to any shingle self-join; capping is the difference between a
    bounded candidate set and 10¹² rows from one hot key at 100 TB).
    Implemented as a broadcast anti-join against the (by construction
    tiny) hot-shingle list: the count aggregate benefits from map-side
    partial aggregation, and the instance stream itself never shuffles —
    a window over the shingle key would push the whole stream through an
    exchange + sort that downstream consumers (the per-doc MinHash
    groupBy) cannot reuse.

    Tokenization happens ONCE into a projected array column before the
    transform — referencing ``split(text)`` inside the slice lambda makes
    codegen re-split the document per shingle position (O(tokens²) string
    work per doc; measured 3.7× slower at sf0.1).

    The scan feeding the explode is widened first (r11): shingling is
    the densest per-row work in every consumer (split + ~tokens slices
    + array_join per doc, then per-shingle hashing/aggregation
    map-side), and a compactly-written document file exposes 1-2 splits
    — measured at sf0.1, the WHOLE shingle+hash+partial-agg pipeline of
    the MinHash signature build ran on one core. ``fanout=64``
    approximates the explode's per-row work multiplier (it only gates
    the widen, sizes nothing); a genuinely large corpus whose scan is
    already wide passes through untouched.

    ``spread_key=True`` (r12, guide §2.4 share one exchange / §2.3
    shuffle fewer bytes): hash-repartition the DOCUMENT rows by
    ``id_col`` instead of the round-robin widen. For consumers that
    re-group the shingle stream per document (the MinHash signature
    groupBy, the PPJoin per-doc array fold), hash(id) established
    before the explode satisfies every downstream groupBy keyed by the
    doc id, so the post-explode shingle stream (~n× the text bytes)
    never crosses an exchange at all — the compact document rows cross
    once instead. Callers whose consumers join/aggregate by SHINGLE
    (decontamination, per-language profiles) gain nothing from doc-id
    partitioning and keep the widen default."""
    from sheetsetl_spark.operators.skew import spread_by_key, widen_to_cores

    docs = (
        spread_by_key(docs, [id_col]) if spread_key
        else widen_to_cores(docs, fanout=64)
    )
    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__w"))
    shingle_list = F.expr(
        f"CASE WHEN size(__w) >= {n} THEN "
        f"transform(sequence(1, size(__w) - {n} + 1), "
        f"  i -> array_join(slice(__w, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    sh = toks.select(
        F.col(id_col), F.explode(F.array_distinct(shingle_list)).alias("shingle")
    )
    if max_df is not None:
        sh = _drop_hot_keys(sh, ["shingle"], max_df)
    return sh


def _drop_hot_keys(df: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Remove rows whose key group has more than ``cap`` members.

    The over-cap key list is tiny by construction (only boilerplate /
    degenerate keys exceed an honest cap), so it broadcasts; the main
    stream is filtered by a broadcast anti-join and never shuffles. The
    count aggregate shrinks map-side to distinct keys per partition."""
    hot = (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > cap)
        .select(*keys)
    )
    return df.join(F.broadcast(hot), keys, "left_anti")


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
    persist: bool = True,
) -> DataFrame:
    """C2: near-duplicate pairs by word-n-gram Jaccard similarity.

    Candidate generation is the shingle equi-self-join (only docs sharing
    a shingle ever meet); |union| = |A| + |B| - |A∩B| avoids materializing
    unions. Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.

    ``max_shingle_df`` drops boilerplate shingles (document frequency
    above the cap) BEFORE the self-join — a shingle in f docs yields f²
    candidate rows, so one hot shingle at corpus scale would dominate the
    whole job. Jaccard is then computed over the capped shingle universe
    (sizes and intersections both post-cap — self-consistent semantics
    that the DuckDB oracle twin mirrors exactly). The RAW stream is
    persisted and the cap is applied on top of the cache: the corpus is
    scanned once (cache fill), the hot list is computed from the cache,
    and each consumer's anti-join is a broadcast filter over cache
    reads — strictly one corpus scan for the whole pipeline.

    ``persist=False`` skips caching (recompute per consumer): for
    repeated small-input invocations — a foreachBatch sink calling this
    once per micro-batch — per-call persists would accumulate in the
    CacheManager for the session lifetime."""
    raw = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    if persist:
        raw = scoped_persist(raw)
    sh = _drop_hot_keys(raw, ["shingle"], max_shingle_df) if max_shingle_df else raw
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    # sz_a/sz_b are per-DOCUMENT size tables — O(corpus) rows, so no
    # broadcast hint: AQE broadcasts at small scale and shuffles on the
    # id key when the corpus outgrows a build side.
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
    persist: bool = True,
) -> DataFrame:
    """C2: DIRECTIONAL near-dup pairs by n-gram containment
    |A ∩ B| / |A| — the excerpt/quotation detector Jaccard misses: a short
    doc fully contained in a long one has high containment but low
    Jaccard (the size asymmetry kills the union ratio). Output:
    (doc_src, doc_dst, containment) where doc_src's shingles are
    >= threshold contained in doc_dst — both directions of each
    candidate pair are scored.

    Same candidate discipline as :func:`ngram_jaccard_pairs` (shingle
    equi-self-join over the df-capped universe — the intersection is
    computed ONCE per unordered pair, then both directional ratios derive
    from it), same single-scan persist contract."""
    raw = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    if persist:
        raw = scoped_persist(raw)
    sh = _drop_hot_keys(raw, ["shingle"], max_shingle_df) if max_shingle_df else raw
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    scored = inter.join(sz_a, "doc_a").join(sz_b, "doc_b")
    # Emit both directions by exploding a 2-struct array, NOT a union of
    # two selects: a union would duplicate the whole candidate pipeline
    # (verified: 0 ReusedExchange), doubling the intersection cost.
    # round6_bin, not plain round: inter/n is rational and CAN land on a
    # true 7th-digit half boundary (e.g. n = 640 => k/640 has 7 decimals
    # ending in 5) where Spark's shortest-repr ROUND and the oracle's
    # binary ROUND diverge — and the threshold filter then diverges too.
    fwd = F.struct(
        F.col("doc_a").alias("doc_src"),
        F.col("doc_b").alias("doc_dst"),
        round6_bin(F.col("inter") / F.col("n_a")).alias("containment"),
    )
    rev = F.struct(
        F.col("doc_b").alias("doc_src"),
        F.col("doc_a").alias("doc_dst"),
        round6_bin(F.col("inter") / F.col("n_b")).alias("containment"),
    )
    return (
        scored.select(F.explode(F.array(fwd, rev)).alias("e"))
        .select("e.*")
        .filter(F.col("containment") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
    hash_family: str = "xxhash64",
    shingle_df: DataFrame | None = None,
    with_size_col: bool = False,
    with_arr_col: bool = False,
) -> DataFrame:
    """MinHash signature per document, min-aggregated over the shingle
    stream — one groupBy, map-side partial mins.

    Each shingle string is hashed ONCE (xxhash64); the num_hashes
    families re-hash that fixed-width value with the family index as
    seed column — one variable-length string hash + k 12-byte hashes per
    shingle instead of k string hashes, and no arithmetic that could
    overflow under ANSI mode. ~num_hashes× less string hashing on a
    100 TB corpus.

    ``shingle_df``: pre-built (typically persisted) shingle stream to use
    instead of deriving one from ``docs`` — lets a pipeline that also
    needs the stream for verification (minhash_lsh_pairs) pay the
    shingling + df-cap cost exactly once.

    ``with_size_col``: additionally emit ``n_sh`` (the per-document
    distinct-shingle count) from the SAME groupBy — the Jaccard
    denominator piggybacks on the signature aggregation instead of
    costing its own shuffle over the stream.

    ``with_arr_col``: additionally emit ``sh_arr`` (the sorted
    distinct-shingle array) from the same groupBy — lets a
    candidate-verify stage intersect per-doc arrays (array_intersect on
    |cand| rows) instead of re-aggregating the stream and running the
    O(|cand| x doc_len) exploded join (r11; the c72/c82 verify shape)."""
    base = shingle_df
    if base is None:
        base = shingles(docs, n=n, id_col=id_col, text_col=text_col, max_df=max_shingle_df)
    if hash_family == "xxhash64":
        sh = base.withColumn("__h", F.xxhash64(F.col("shingle")))
        mins = [
            F.min(F.xxhash64(F.lit(i), F.col("__h"))).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    elif hash_family == "md5":
        # Engine-portable twin: 60-bit md5 prefixes (same trick as
        # simhash64(token_hash='md5')) so a DuckDB oracle can replicate
        # the signatures bit-for-bit. ~2-3x the hashing cost of the
        # xxhash64 default — the audit path, not the production path.
        def p60(col: Column) -> Column:
            return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")

        sh = base.withColumn("__h", p60(F.col("shingle")))
        mins = [
            F.min(
                p60(F.concat_ws(":", F.lit(str(i)), F.col("__h").cast("string")))
            ).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    else:  # pragma: no cover - guarded upstream
        raise ValueError(f"unknown hash_family: {hash_family}")
    if with_size_col:
        mins = [*mins, F.count("*").alias("n_sh")]
    if with_arr_col:
        mins = [*mins, F.sort_array(F.collect_list("shingle")).alias("sh_arr")]
    return sh.groupBy(id_col).agg(*mins)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
    max_bucket_size: int | None = 1000,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """C2: MinHash + LSH banding near-dup candidates, verified by true
    Jaccard >= threshold.

    rows_per_band = num_hashes / bands; docs agreeing on any full band
    collide into a bucket; candidates come from the bucket equi-join.
    This is the 100 TB path: signature table is O(docs), band join touches
    only colliding docs. Verification reuses the exact Jaccard operator on
    the candidate subset.

    Two scale guards: ``max_shingle_df`` caps boilerplate shingles in
    BOTH the signature and verification streams (same capped universe as
    :func:`ngram_jaccard_pairs`, so LSH output still equals the exact
    operator's wherever banding recall is 1); ``max_bucket_size`` drops
    degenerate band buckets (a bucket of m near-identical templated docs
    contributes m² candidates — at corpus scale a boilerplate-heavy
    source can put millions of docs in one bucket). The bucket cap is a
    recall guard only: it binds on pathological buckets far above any
    honest near-dup cluster size.

    The shingle stream feeds the hot-shingle aggregate and the signature
    groupBy, so the RAW stream is persisted (memory, spill to disk) and
    the df-cap is an anti-join applied over cache reads — without this
    the lineage would re-shingle the corpus per consumer. Spark's cache
    manager keys on the canonicalized plan, so repeated calls over the
    same input reuse one cache entry. Verification (r11) intersects
    per-doc sorted shingle ARRAYS collected in the SAME groupBy as the
    signatures (``with_arr_col``), so the old second aggregation over
    the stream and the O(|cand| x doc_len) exploded verify join are
    gone — the signature frame (now the only multi-consumer) is
    persisted instead and candidates fetch two arrays each."""
    if num_hashes % bands:
        raise ValueError(f"num_hashes={num_hashes} not divisible by bands={bands}")
    rows_per_band = num_hashes // bands
    # spread_key examined and NOT used here (r12): the signature
    # groupBy consumes the stream through the persist below, and a
    # lazily-persisted plan is an unfinalized AdaptiveSparkPlan whose
    # output partitioning reads as Unknown at consumer-planning time —
    # the groupBy re-shuffles regardless, so a keyed spread would only
    # ADD a document exchange (measured neutral-to-noise at sf0.1; the
    # direct-lineage callers edit_distance_pairs /
    # prefix_filter_jaccard_pairs DO elide and use it).
    raw = scoped_persist(shingles(docs, n=n, id_col=id_col, text_col=text_col))
    sh = _drop_hot_keys(raw, ["shingle"], max_shingle_df) if max_shingle_df else raw
    sig = scoped_persist(
        minhash_signatures(
            docs,
            num_hashes=num_hashes,
            n=n,
            id_col=id_col,
            text_col=text_col,
            max_shingle_df=max_shingle_df,
            hash_family=hash_family,
            shingle_df=sh,
            with_size_col=True,
            with_arr_col=True,
        )
    )
    if hash_family == "md5":
        # portable mode: the raw ':'-joined band value IS the bucket key
        # (band hashing is only a width optimization) so a DuckDB twin
        # can rebuild the buckets verbatim
        band_cols = [
            F.concat_ws(
                ":", *[F.col(f"mh_{b * rows_per_band + j}") for j in range(rows_per_band)]
            ).alias(f"band_{b}")
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.xxhash64(
                *[F.col(f"mh_{b * rows_per_band + j}") for j in range(rows_per_band)]
            ).alias(f"band_{b}")
            for b in range(bands)
        ]
    banded = sig.select(F.col(id_col), "n_sh", *band_cols)
    stacked = banded.select(
        F.col(id_col),
        "n_sh",
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
    )
    if max_bucket_size is not None:
        # The bucket-cap's hot-list subquery and both join sides read
        # stacked = a posexplode over the PERSISTED signature frame
        # (r11: sig, not the band table, is the multi-consumer persist —
        # it also feeds the verify arrays), so counting bucket sizes is
        # a cache read plus a trivial explode, never a re-aggregation.
        # Lifecycle: the returned pair DF stays lazy, so this operator
        # cannot unpersist safely itself — wrap call + consumption in
        # ``sheetsetl_spark.cache.cache_scope()`` to bound the entries'
        # lifetime (outside a scope they live until cleared, deduped by
        # Spark's plan-keyed cache manager).
        stacked = _drop_hot_keys(stacked, ["band_idx", "band_hash"], max_bucket_size)
    left = stacked.select(
        F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"), "band_idx", "band_hash"
    )
    right = stacked.select(
        F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"), "band_idx", "band_hash"
    )
    # n_a/n_b (the Jaccard denominators) ride along with the band join —
    # they came for free from the signature groupBy, so no separate size
    # aggregate and no size join afterwards.
    candidates = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "n_a", "n_b")
        .distinct()
    )
    # Candidate-proportional verification: intersection sizes are computed
    # ONLY for LSH candidates (never all-pairs — that would undo the whole
    # point of banding at scale). The per-doc sorted shingle arrays come
    # from the SAME capped stream and the SAME groupBy as the signatures
    # (with_arr_col), so the verified Jaccard matches the exact
    # operator's, the corpus is not re-scanned, and each candidate pair
    # fetches two arrays instead of exploding |cand| x doc_len rows
    # through a pair-keyed shuffle (the c72/c82 verify shape; r11).
    a = sig.select(F.col(id_col).alias("doc_a"), F.col("sh_arr").alias("sa"))
    b = sig.select(F.col(id_col).alias("doc_b"), F.col("sh_arr").alias("sb"))
    inter_col = F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("long")
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", "n_a", "n_b", inter_col.alias("inter"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_estimate_audit(
    docs: DataFrame,
    threshold: float,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Estimator-accuracy audit for the MinHash family: for every LSH
    candidate pair whose EXACT Jaccard reaches ``threshold``, emit the
    signature-agreement ESTIMATE next to the exact value —
    (doc_a, doc_b, jaccard, est_jaccard, abs_err).

    The production dedup path (minhash_lsh_pairs) verifies candidates
    with exact Jaccard precisely because the k-component estimate has
    sd sqrt(j(1-j)/k) (~0.12 at j=0.5, k=16) — far too loose to
    threshold on. This operator is the measured-evidence row for that
    design choice (the honest-estimator sibling of c35/c91's ANN
    recall rows): at 100 TB you periodically audit the estimator
    against exact Jaccard on the (candidate-proportional) verified
    subset, never corpus-wide.

    md5-portable family only (the audit path must be engine-portable so
    a DuckDB twin rebuilds signatures bit-for-bit). One signature
    aggregation feeds banding AND both agreement sides (persisted);
    verification reuses the same capped shingle stream — the corpus is
    scanned once for shingles, once for signatures."""
    if num_hashes % bands:
        raise ValueError(f"num_hashes={num_hashes} not divisible by bands={bands}")
    rpb = num_hashes // bands
    # spread_key not used: persisted-stream consumer, see
    # minhash_lsh_pairs.
    raw = scoped_persist(shingles(docs, n=n, id_col=id_col, text_col=text_col))
    sh = _drop_hot_keys(raw, ["shingle"], max_shingle_df) if max_shingle_df else raw
    sig = scoped_persist(
        minhash_signatures(
            docs,
            num_hashes=num_hashes,
            n=n,
            id_col=id_col,
            text_col=text_col,
            max_shingle_df=max_shingle_df,
            hash_family="md5",
            shingle_df=sh,
            with_size_col=True,
        )
    )
    band_cols = [
        F.concat_ws(
            ":", *[F.col(f"mh_{b * rpb + j}") for j in range(rpb)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    stacked = sig.select(
        F.col(id_col),
        F.posexplode(F.array(*[c for c in band_cols])).alias("band_idx", "band_hash"),
    )
    candidates = (
        stacked.select(F.col(id_col).alias("doc_a"), "band_idx", "band_hash")
        .join(
            stacked.select(F.col(id_col).alias("doc_b"), "band_idx", "band_hash"),
            ["band_idx", "band_hash"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    agree = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    a_sig = sig.select(
        F.col(id_col).alias("doc_a"),
        F.col("n_sh").alias("n_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(num_hashes)],
    )
    b_sig = sig.select(
        F.col(id_col).alias("doc_b"),
        F.col("n_sh").alias("n_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(num_hashes)],
    )
    withest = (
        candidates.join(a_sig, "doc_a")
        .join(b_sig, "doc_b")
        .select(
            "doc_a", "doc_b", "n_a", "n_b",
            (agree.cast("double") / F.lit(float(num_hashes))).alias("__est"),
        )
    )
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        withest.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b", "__est")
        .agg(F.count("*").alias("inter"))
    )
    j_raw = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.select(
            "doc_a",
            "doc_b",
            round6_bin(j_raw).alias("jaccard"),
            round6_bin(F.col("__est")).alias("est_jaccard"),
            round6_bin(F.abs(F.col("__est") - j_raw)).alias("abs_err"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _embedding_signatures(
    vectors: DataFrame,
    num_planes: int,
    dim: int,
    id_col: str,
    vec_col: str,
    err_label: str,
) -> DataFrame:
    """Per-vector hyperplane signature projection shared by the batch
    pair-finder and the incremental index: (vec_id, v, nrm, bits).

    HOF (zip_with + aggregate) DELIBERATELY, not a flat unrolled Add
    chain: an unrolled num_planes×dim expression (~6k literal nodes) is
    ~1.5x faster per ROW in an isolated projection, but blows up
    Catalyst analysis/canonicalization/codegen across the composite
    pipelines that re-reference this frame and re-plan per AQE stage —
    measured c2e 3.5s -> 13.4s at sf0.1 from DRIVER-side planning alone
    (r7 A/B, SCALE.md). Compact HOF plans win end-to-end; revisit only
    if Spark codegens lambdas.

    ||v|| is computed ONCE here and carried to every verify consumer.
    Guarded: a NULL/zero-norm vector would make a verify cosine
    0/0 = NaN, which sorts ABOVE every threshold in a desc comparison —
    fail loudly instead (the similarity.py::_checked_norm hazard class);
    the guard lives in aggregate's FINISH lambda, so the dim-element
    fold runs once per row (the r6 duplicate-evaluation lesson)."""
    from sheetsetl_spark.operators.similarity import hyperplanes

    planes = hyperplanes(num_planes, dim)
    # The whole projection is built as TWO parsed SQL expressions (plane
    # matrix inlined as a literal): the Python-lambda HOF + per-element
    # F.lit form cost ~1.8s (literals) + ~0.9s (lambda construction) of
    # py4j round-trips per DataFrame BUILD — pure driver tax paid on
    # every invocation of every consumer (functions/lits.py rationale;
    # r11). The parsed string yields the identical Catalyst tree, so
    # signatures are bit-identical.
    matrix_sql = (
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(v)) + "D" for v in row) + ")"
            for row in planes
        )
        + ")"
    )
    vec_sql = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    bits = F.expr(
        f"concat_ws('', transform({matrix_sql}, "
        f"row -> CASE WHEN aggregate(zip_with(row, {vec_sql}, "
        "(a, b) -> a * b), 0.0D, (acc, x) -> acc + x) > 0 "
        "THEN '1' ELSE '0' END))"
    )
    norm = F.expr(
        f"aggregate(zip_with({vec_sql}, {vec_sql}, (x, y) -> x * y), 0.0D, "
        "(acc, x) -> acc + x, "
        f"s -> CASE WHEN s > 0 THEN sqrt(s) ELSE raise_error('{err_label}: "
        "NULL or zero-norm vector has no direction; filter such rows out "
        "first') END)"
    )
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        F.expr(vec_sql).alias("v"),
        norm.alias("nrm"),
        bits.alias("bits"),
    )


def choose_banding(n_rows: int, bands: int = 4) -> tuple[int, int]:
    """Band-width policy for the hyperplane-LSH embedding family:
    returns ``(num_planes, bands)`` for a corpus of ``n_rows`` vectors.

    Codifies the r9-MEASURED band-value-space law (SCALE.md): the band
    value space ``2^(num_planes/bands)`` must track the corpus size to
    keep per-bucket occupancy O(1) — with 8-bit bands (256 values) the
    banded equi-join's candidate mass is ~n²/256 per band, which
    spilled 78 GB and died at 200k vectors, while 16-bit bands
    completed in 25.8s with planted recall 1.0. Measured anchors:

    * n ≤ 20,000 — 8-bit bands (the legacy 32/4 default): verified
      linear through the 10x fixture; also what every registered
      oracle twin inlines, so the small regime must stay EXACTLY here.
    * n = 200,000 — 16-bit bands (64/4): the measured 100x fix.
    * beyond — occupancy law: width ≥ log2(n/4), i.e. ≤4 expected
      vectors per bucket for uniformly-spread signatures, floored at
      the verified 16 and capped at 30 (a 10⁹-vector corpus gets
      28-bit bands; signature cost grows only linearly in width).

    Widening bands lowers per-band recall (p^w for plane-agreement p);
    16-bit×4 was recall-verified at threshold 0.98 — for looser
    thresholds add bands as you widen rather than trusting the cap.
    """
    if n_rows <= 20_000:
        width = 8
    else:
        # ceil(log2(ceil(n/4))) == bit_length(ceil(n/4) - 1)
        width = min(30, max(16, (-(-n_rows // 4) - 1).bit_length()))
    return width * bands, bands


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.98,
    num_planes: int | None = None,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """C2: embedding-cosine near-duplicate pairs via hyperplane-LSH
    blocking + exact cosine verification.

    Candidate generation: each vector gets a ``num_planes``-bit signature
    (sign of dot with deterministic ±1 hyperplanes), split into ``bands``
    bands; vectors agreeing on any full band collide. Banding is the
    OR-construction that keeps recall ≈ 1 for sims near the threshold
    while the candidate join stays an equi-join on (band_idx, band_val)
    — the only pattern that survives a billion-vector corpus (never a
    cross join). Verification computes exact cosine only for candidates.

    PARAMETER-SCALING RULE (measured, SCALE.md round-9; codified in
    :func:`choose_banding` round-10): the band VALUE SPACE
    ``2^(num_planes/bands)`` must track the corpus size to keep
    per-bucket occupancy O(1). 8-bit bands (256 values) suit
    ~10^3-10^4 vectors; at 200k vectors (the 100x fixture) the
    per-band candidate mass of 8-bit bands spilled 78 GB before dying,
    while 16-bit bands (num_planes=64, bands=4) completed in 75.7s with
    every planted >=0.98 pair still recovered. Same defect class as the
    media tier's dead-band quadratic: bucket occupancy, not corpus
    size, is what the equi-join pays for. Widening bands lowers
    per-band recall (p^w for plane-agreement p), so when you widen,
    re-check recall on your threshold — near sim 0.98+, 16-bit bands x4
    keep recall >0.99; for looser thresholds add bands as you widen.

    ``num_planes=None`` (the default) applies the law automatically by
    feeding a ``count()`` of the input to :func:`choose_banding`. That
    count is cheap only for (near-)raw scans — a DERIVED frame (unions,
    zip_with/transform columns, expensive filters) pays a full extra
    evaluation of its plan just to be counted. Callers that already
    know the corpus size should pass ``n_rows`` (skips the count
    entirely; c49's ingest derives it from the stored index the same
    way) or pin ``num_planes`` outright. NOTE (r10 behavior change):
    the pre-law default was a fixed 32/4 — >20k-row callers now get
    wider bands and thus slightly lower per-band recall (measured
    >0.99 at threshold 0.98; re-check if your threshold is looser).

    Output: (vec_a, vec_b, sim) with vec_a < vec_b and sim >= threshold.
    """
    if num_planes is None:
        num_planes, bands = choose_banding(
            n_rows if n_rows is not None else vectors.count(), bands
        )
    if num_planes % bands:
        raise ValueError(f"num_planes={num_planes} not divisible by bands={bands}")
    rows_per_band = num_planes // bands
    # Signature bits cost num_planes × dim multiply-adds per vector and
    # feed three consumers (banding + both verify sides) — persist so the
    # projection runs once instead of three times; widen first so the
    # projection (and every cached partition downstream) isn't capped at
    # a compact fixture's row-group count (skew.widen_to_cores).
    from sheetsetl_spark.operators.skew import widen_to_cores

    sig = scoped_persist(
        _embedding_signatures(
            widen_to_cores(vectors),
            num_planes, dim, id_col, vec_col, "embedding_neardup_pairs",
        )
    )
    band_arr = F.array(
        *[F.substring("bits", b * rows_per_band + 1, rows_per_band) for b in range(bands)]
    )
    stacked = sig.select(
        "vec_id", F.posexplode(band_arr).alias("band_idx", "band_val")
    )
    left = stacked.select(F.col("vec_id").alias("vec_a"), "band_idx", "band_val")
    right = stacked.select(F.col("vec_id").alias("vec_b"), "band_idx", "band_val")
    pairs = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = sig.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    eb = sig.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )

    from sheetsetl_spark.operators.similarity import _dot

    sim = _dot("va", "vb") / (F.col("na") * F.col("nb"))
    # No broadcast hint on the vector sides: at fixture scale AQE
    # broadcasts them anyway, but at 10⁹ vectors the vector table is the
    # BIG side (candidates ≪ corpus) and the hint would force an
    # un-broadcastable build — let the planner pick shuffle-hash on the
    # id key when the sides grow.
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("sim"))
    )


def embedding_band_index(
    vectors: DataFrame,
    num_planes: int | None = None,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """The STORED index for incremental embedding near-dup: one row per
    (vector, band) — (vec_id, v, nrm, band_idx, band_val).

    Unlike the text index (minhash_band_table stores signatures only —
    re-deriving shingles would rescan history TEXT), the vector itself
    rides along: embeddings are compact (dim doubles ≈ the signature's
    own footprint), and storing them buys EXACT cosine verification at
    ingest time instead of a Hamming-agreement estimate, whose sd at 32
    planes (~0.09 in cos-angle) is far too loose for a 0.98 threshold.
    Persist this frame (e.g. parquet partitioned by band_idx) and append
    survivors' rows after each ingest; per-ingest cost is then
    O(new + collisions) with no history rescan.

    ``num_planes=None`` sizes the band value space from a ``count()``
    of the HISTORY corpus via :func:`choose_banding` — the right
    default for index CREATION (history is the big side whose bucket
    occupancy the law protects). The count is cheap only when the
    history frame is a (near-)raw scan; a derived frame (planted
    unions, transformed columns) pays a full extra evaluation — pass
    ``n_rows`` when the size is already known. Ingest-side consumers
    must match the stored banding:
    :func:`incremental_embedding_neardup_filter` re-derives it from
    the index frame itself, never from the batch."""
    if num_planes is None:
        num_planes, bands = choose_banding(
            n_rows if n_rows is not None else vectors.count(), bands
        )
    if num_planes % bands:
        raise ValueError(f"num_planes={num_planes} not divisible by bands={bands}")
    rpb = num_planes // bands
    from sheetsetl_spark.operators.skew import widen_to_cores

    # the signature projection is num_planes x dim interpreted
    # multiply-adds per vector — the compute-dense case widen_to_cores
    # exists for (a compact corpus parquet exposes 1-8 row groups)
    sig = _embedding_signatures(
        widen_to_cores(vectors), num_planes, dim, id_col, vec_col,
        "embedding_band_index",
    )
    band_arr = F.array(
        *[F.substring("bits", b * rpb + 1, rpb) for b in range(bands)]
    )
    return sig.select(
        "vec_id", "v", "nrm", F.posexplode(band_arr).alias("band_idx", "band_val")
    )


def incremental_embedding_neardup_filter(
    new_vectors: DataFrame,
    index: DataFrame,
    threshold: float = 0.98,
    num_planes: int | None = None,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental embedding near-dup against a MAINTAINED band index
    (:func:`embedding_band_index`): drop new-batch vectors whose EXACT
    cosine to any colliding indexed vector reaches ``threshold``; return
    the surviving new rows. The vector twin of
    :func:`incremental_neardup_filter_sig` (same ingest shape as the
    reference-scale story: candidates from a band equi-join against the
    stored index, verification only on collisions, O(new + collisions)
    per ingest, no history rescan).

    ``max_bucket_size`` caps degenerate index buckets before the join
    (a hot band value shared by millions of history vectors would make
    the join quadratic in that bucket); over-cap rows just can't match
    via that band — the standard recall trade. Default ``None``
    preserves exact parity with the c49 oracle twin.

    ``num_planes=None`` re-derives the banding FROM THE INDEX (one
    pruned two-column agg: bands = max(band_idx)+1, band width =
    length(band_val)) — never from the new batch, whose size says
    nothing about the stored layout: a 60-row ingest against a 200k
    index must signature the batch with the index's 16-bit scheme or
    the equi-join keys don't line up at all. Empty index → the law is
    applied to the batch itself via :func:`choose_banding`."""
    if num_planes is None:
        hdr = index.agg(
            F.max("band_idx").alias("bi"),
            F.max(F.length("band_val")).alias("w"),
        ).collect()[0]
        if hdr["bi"] is None:  # empty index: nothing stored to match
            num_planes, bands = choose_banding(new_vectors.count(), bands)
        else:
            bands = int(hdr["bi"]) + 1
            num_planes = bands * int(hdr["w"])
    if max_bucket_size is not None:
        index = _drop_hot_keys(index, ["band_idx", "band_val"], max_bucket_size)
    new_bands = embedding_band_index(
        new_vectors, num_planes=num_planes, bands=bands, dim=dim,
        id_col=id_col, vec_col=vec_col,
    )
    old = index.select(
        F.col("vec_id").alias("old_id"),
        F.col("v").alias("old_v"),
        F.col("nrm").alias("old_n"),
        "band_idx",
        "band_val",
    )
    new = new_bands.select(
        F.col("vec_id").alias("new_id"),
        F.col("v").alias("new_v"),
        F.col("nrm").alias("new_n"),
        "band_idx",
        "band_val",
    )
    candidates = (
        new.join(old, ["band_idx", "band_val"])
        .select("new_id", "new_v", "new_n", "old_id", "old_v", "old_n")
        .distinct()
    )
    from sheetsetl_spark.operators.similarity import _dot

    dups = (
        candidates.withColumn(
            "sim", _dot("new_v", "old_v") / (F.col("new_n") * F.col("old_n"))
        )
        .filter(F.col("sim") >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_vectors.join(dups, id_col, "left_anti")


def simhash64(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: str = "xxhash64",
) -> DataFrame:
    """C2: 64-bit SimHash per document over unigram tokens.

    bit_j(doc) = sign of sum over tokens of ±1 (bit j of hash(token)).
    Implemented as 64 conditional-sum aggregates over the exploded token
    stream — one shuffle, no UDF.

    ``token_hash``: 'xxhash64' (fastest, JVM-only) or 'md5' (a 60-bit
    value from the md5 hex prefix — engine-portable, what the DuckDB
    oracle twin uses; see queries/extensions.py::c2c_simhash)."""
    tok = docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t"))
    if token_hash == "md5":
        n_bits = 60  # 15 hex chars -> always positive, fits signed 64-bit
        tok = tok.withColumn(
            "h", F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("bigint")
        )
    else:
        n_bits = 64
        tok = tok.withColumn("h", F.xxhash64("t"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{j}")
        for j in range(n_bits)
    ]
    sums = tok.groupBy(id_col).agg(*bit_sums)
    # 2**63 overflows signed 64-bit; emit the fingerprint as two 32-bit
    # halves packed into a hex string.
    lo = reduce(
        lambda acc, j: acc + F.when(F.col(f"s_{j}") > 0, F.lit(1 << j)).otherwise(0),
        range(32),
        F.lit(0).cast("bigint"),
    )
    hi = reduce(
        lambda acc, j: acc + F.when(F.col(f"s_{j + 32}") > 0, F.lit(1 << j)).otherwise(0),
        range(n_bits - 32),
        F.lit(0).cast("bigint"),
    )
    return sums.select(F.col(id_col), F.concat_ws(":", F.hex(hi), F.hex(lo)).alias("simhash"))


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over an undirected pair list — the step that
    turns pairwise near-dup output (C2) into duplicate CLUSTERS so a
    corpus can keep exactly one canonical doc per cluster.

    Min-label propagation: every node starts labelled with its own id;
    each round every node takes the min of its own and its neighbors'
    labels; converged when the (monotonically decreasing) label sum stops
    changing. Rounds needed = graph diameter — near-dup clusters are
    shallow (dups of a common source), so this terminates in a handful of
    distributed rounds; each round is one equi-join + one groupBy, both
    Catalyst-shuffled on the node key, and the frontier is
    localCheckpointed so plan depth stays constant. The driver sees only
    one scalar (the label sum) per round, never the data.

    Returns (node, cluster_id) with cluster_id = min node id reachable.
    """
    # Symmetrize by exploding a two-struct array, not a self-union: the
    # union form evaluates the ENTIRE upstream pairs pipeline (often the
    # full LSH candidate job) twice at checkpoint time.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
                    ),
                    F.struct(
                        F.col(dst_col).alias("u"), F.col(src_col).alias("v")
                    ),
                )
            ).alias("e")
        )
        .select("e.*")
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iterations):
        neighbor_labels = edges.join(
            labels.select(F.col("node").alias("u"), "label"), "u"
        ).select(F.col("v").alias("node"), "label")
        labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select("node", F.col("label").alias("cluster_id"))


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    k_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Deterministic stratified downsampling: keep the k rows per stratum
    that rank first by md5(id) — a reproducible pseudo-random order that
    needs no seed plumbing and recomputes identically on any cluster (and
    in the DuckDB oracle, unlike sampleBy's partition-dependent Bernoulli
    draw). The corpus-balancing primitive: cap every source/language at k.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_per_stratum)
        .drop("__rn")
    )


def eval_decontamination(
    train: DataFrame,
    evals: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing at
    least one word n-gram with an eval/benchmark document, with the
    evidence counts a removal decision needs (how many eval docs, how
    many distinct shared shingles).

    The eval set is tiny next to a 100 TB corpus, so its shingle table is
    broadcast — each training partition checks its shingles locally with
    zero shuffle of the corpus side; only the (rare) hits are aggregated.
    Output: (train_doc_id, n_eval_docs, n_shared_shingles).
    """
    tr = shingles(train, n=n, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("train_doc_id"), "shingle"
    )
    ev = shingles(evals, n=n, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("eval_id"), "shingle"
    )
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("train_doc_id")
        .agg(
            F.countDistinct("eval_id").alias("n_eval_docs"),
            F.count("*").alias("n_shared_shingles"),
        )
    )


def weighted_resample(
    docs: DataFrame,
    weights: DataFrame,
    join_col: str = "source",
    weight_col: str = "weight",
    id_col: str = "doc_id",
    tag: str = "mix",
) -> DataFrame:
    """Materialize a target corpus mix from per-group sampling weights:
    every row is emitted floor(w) times plus one more with probability
    frac(w), driven by a deterministic md5 uniform of (tag, id) — so
    w < 1 downsamples, w > 1 oversamples (with copy_id distinguishing
    repeats), and the output is a pure function of (ids, weights, tag)
    on any cluster/partitioning.

    The weight table is groups-sized -> broadcast; the corpus side maps
    in place (hash + compare + explode), no shuffle at all.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(tag), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    w = F.col(weight_col)
    n_copies = (F.floor(w) + (u < (w - F.floor(w))).cast("bigint")).alias("n_copies")
    joined = docs.join(F.broadcast(weights), join_col).withColumn("n_copies", n_copies)
    return (
        joined.filter(F.col("n_copies") >= 1)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))))
        .drop("n_copies")
    )


def semantic_dedup(
    vectors: DataFrame,
    num_centroids: int = 16,
    threshold: float = 0.95,
    max_cluster_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """C2 semantic tier (SemDeDup-shaped): coarse-cluster the embedding
    corpus, then drop every vector whose cluster holds a smaller-id vector
    with cosine >= ``threshold``. Returns the KEPT rows as (id, cent_id).

    Priority-by-id (instead of connected components) makes the result a
    pure semi-join: a vector survives iff no higher-priority near-twin
    shares its cluster — deterministic, one pass, no iteration. Centroids
    are the deterministic ``id < num_centroids`` subset so the whole
    operator (assignment included) is DuckDB-oracle-checkable; swap in
    trained k-means centroids via a broadcast table in production.

    Scale: assignment is broadcast(M) x corpus with no shuffle; the
    pairwise stage is one shuffle on cent_id and O(sum c_i^2) work, the
    SemDeDup contract — num_centroids must grow ~sqrt(N) so clusters stay
    bounded. ``max_cluster_size`` is the skew fuse: clusters bigger than
    the cap skip pairwise entirely (all kept, flagged upstream) rather
    than detonating a c^2 join on a degenerate centroid.
    """
    from sheetsetl_spark.operators.similarity import _dot
    from sheetsetl_spark.operators.skew import widen_to_cores

    # the assignment crossJoin (corpus x broadcast centroids, an
    # interpreted dot per pair) is compute-dense: don't let a compact
    # fixture's 2-8 row groups cap it (r9 100x find)
    e = widen_to_cores(vectors).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("vn", F.sqrt(_dot("v", "v")))
    cent = e.filter(F.col("vec_id") < num_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"), F.col("vn").alias("cn")
    )
    csim = _dot("v", "cv") / (F.col("vn") * F.col("cn"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cent_id"))
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "v", "vn", "cent_id", csim.alias("csim"))
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "v", "vn", "cent_id")
        # 3 consumers (both pairwise sides + the final anti-join), and
        # the frame embeds the corpus x centroids assignment crossJoin —
        # un-pinned, each consumer re-ran it (the multi-consumer rule)
        .localCheckpoint(eager=False)
    )
    pairwise = assigned
    if max_cluster_size is not None:
        sizes = assigned.groupBy("cent_id").agg(F.count("*").alias("__csz"))
        pairwise = assigned.join(
            F.broadcast(sizes.filter(F.col("__csz") <= max_cluster_size)), "cent_id"
        ).drop("__csz")
    a = pairwise.select(
        "cent_id",
        F.col("vec_id").alias("keep_id"),
        F.col("v").alias("av"),
        F.col("vn").alias("an"),
    )
    b = pairwise.select(
        "cent_id",
        F.col("vec_id").alias("dup_id"),
        F.col("v").alias("bv"),
        F.col("vn").alias("bn"),
    )
    sim = _dot("av", "bv") / (F.col("an") * F.col("bn"))
    dups = (
        a.join(b, ["cent_id"])
        .filter(F.col("keep_id") < F.col("dup_id"))
        .filter(sim >= threshold)
        .select("dup_id")
        .distinct()
    )
    return assigned.join(
        dups, assigned["vec_id"] == dups["dup_id"], "left_anti"
    ).select("vec_id", "cent_id")


def fuzzy_name_pairs(
    df: DataFrame,
    text_col: str = "name",
    max_distance: int = 4,
    max_block_size: int | None = 10000,
) -> DataFrame:
    """Entity-resolution fuzzy matching: near-identical NAME pairs by
    Levenshtein distance, blocked on the last token.

    Works at the distinct-name level — the whole point of canonicalizing
    entities is that distinct names are orders of magnitude fewer than
    rows, so the pairwise stage runs on the small side and the result
    joins back to the corpus as a broadcast mapping. Blocking on the
    final token (the head noun in 'cold widget' / 'small widget') keeps
    the self-join an equi-join; ``max_block_size`` is the same skew fuse
    the shingle/bucket caps provide. Output: (name_a, name_b, distance)
    with name_a < name_b.
    """
    names = df.select(F.lower(F.trim(F.col(text_col))).alias("name")).distinct()
    blocked = names.withColumn("block", F.element_at(F.split(F.col("name"), " "), -1))
    if max_block_size is not None:
        w = Window.partitionBy("block")
        blocked = (
            blocked.withColumn("__bsz", F.count("*").over(w))
            .filter(F.col("__bsz") <= max_block_size)
            .drop("__bsz")
        )
    a = blocked.select(F.col("name").alias("name_a"), "block")
    b = blocked.select(F.col("name").alias("name_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("name_a", "name_b", "distance")
    )


def dedup_paragraphs(
    docs: DataFrame,
    chunk_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Paragraph-level exact dedup (the CCNet/Dolma preprocessing step):
    split each document into fixed-width token chunks ("paragraphs" — the
    fixtures have no newline structure), keep only the globally-FIRST
    occurrence of every distinct chunk, and reassemble each document from
    its surviving chunks in order.

    First occurrence is the lexicographic minimum of (doc_id, chunk_idx)
    — deterministic under any partitioning, computed as a MIN of a struct
    over a window keyed on the chunk text. Two shuffles total at any
    scale: one on chunk text (the winner window), one on doc id (the
    reassembly); no self-join, no second corpus scan. Documents whose
    every chunk first appeared elsewhere vanish from the output (fully
    boilerplate docs), matching the oracle twin.

    Output: (id, clean_text, n_kept_chunks).
    """
    from sheetsetl_spark.operators.text import chunk_documents

    chunks = chunk_documents(
        docs, chunk_tokens=chunk_tokens, stride=chunk_tokens, id_col=id_col, text_col=text_col
    )
    w = Window.partitionBy("chunk_text")
    first = F.min(F.struct(id_col, "chunk_idx")).over(w)
    kept = chunks.withColumn("__first", first).filter(
        (F.col(id_col) == F.col(f"__first.{id_col}"))
        & (F.col("chunk_idx") == F.col("__first.chunk_idx"))
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
        lambda x: x["chunk_text"],
    )
    return kept.groupBy(id_col).agg(
        F.array_join(ordered, " ").alias("clean_text"),
        F.count("*").cast("int").alias("n_kept_chunks"),
    )


def incremental_neardup_filter(
    new_docs: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
    persist: bool = True,
) -> DataFrame:
    """Incremental near-dup: drop new-batch documents that near-duplicate
    an EXISTING corpus (the daily-crawl-vs-history shape).

    The scale property is the asymmetric band join: history↔history pairs
    are never generated (history was already deduped when it was
    ingested), so each increment costs O(new + collisions), not
    O(corpus²). In production the corpus side's signatures are a stored
    table maintained across ingests; here they are derived inline from
    the corpus DataFrame. Shingle df-caps apply per side (each side's
    boilerplate is capped against its own frequency profile).

    Verification computes true cross-side Jaccard only for band
    collisions, so the kept set equals the exact-Jaccard answer whenever
    banding recall is 1 (the same contract as minhash_lsh_pairs).

    Output: the new-batch rows that survive (id + text + any other
    columns of ``new_docs``).
    """
    rows_per_band = num_hashes // bands
    # One persisted raw shingle stream per side: banding signatures AND
    # verification read the cache; the df-cap is a broadcast anti-join
    # over cache reads (single scan of each side, same policy as
    # minhash_lsh_pairs).
    # spread_key not used: both sides persist below, see
    # minhash_lsh_pairs (an unfinalized cached plan's partitioning
    # reads as Unknown, so the signature groupBys re-shuffle anyway).
    raw_new = shingles(new_docs, n=n, id_col=id_col, text_col=text_col)
    raw_old = shingles(corpus, n=n, id_col=id_col, text_col=text_col)
    if persist:  # see ngram_jaccard_pairs: streaming callers pass False
        raw_new = scoped_persist(raw_new)
        raw_old = scoped_persist(raw_old)
    sh_new = (
        _drop_hot_keys(raw_new, ["shingle"], max_shingle_df) if max_shingle_df else raw_new
    )
    sh_old = (
        _drop_hot_keys(raw_old, ["shingle"], max_shingle_df) if max_shingle_df else raw_old
    )

    def banded(side: DataFrame, capped_sh: DataFrame, alias: str) -> DataFrame:
        sig = minhash_signatures(
            side, num_hashes=num_hashes, n=n, id_col=id_col,
            text_col=text_col, shingle_df=capped_sh,
        )
        band_cols = [
            F.xxhash64(
                *[F.col(f"mh_{b * rows_per_band + j}") for j in range(rows_per_band)]
            ).alias(f"band_{b}")
            for b in range(bands)
        ]
        return sig.select(F.col(id_col).alias(alias), *band_cols).select(
            F.col(alias),
            F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
                "band_idx", "band_hash"
            ),
        )

    candidates = (
        banded(new_docs, sh_new, "new_id")
        .join(banded(corpus, sh_old, "old_id"), ["band_idx", "band_hash"])
        .select("new_id", "old_id")
        .distinct()
    )
    inter = (
        candidates.join(sh_new.select(F.col(id_col).alias("new_id"), "shingle"), "new_id")
        .join(sh_old.select(F.col(id_col).alias("old_id"), "shingle"), ["old_id", "shingle"])
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("inter"))
    )
    sz_new = sh_new.groupBy(id_col).agg(F.count("*").alias("n_new")).select(
        F.col(id_col).alias("new_id"), "n_new"
    )
    sz_old = sh_old.groupBy(id_col).agg(F.count("*").alias("n_old")).select(
        F.col(id_col).alias("old_id"), "n_old"
    )
    dups = (
        inter.join(sz_new, "new_id")
        .join(sz_old, "old_id")
        .filter(
            F.round(
                F.col("inter") / (F.col("n_new") + F.col("n_old") - F.col("inter")), 6
            )
            >= threshold
        )
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_docs.join(dups, id_col, "left_anti")


def minhash_band_table(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The maintained dedup INDEX for incremental ingest: per document,
    the full minhash signature (as an array) plus the band hashes, in
    band-exploded long form (id, band_idx, band_hash, sig).

    This is what production near-dup systems persist between ingests —
    O(docs × bands) short rows, NOT the shingle stream — so each new
    batch pays O(new + collisions) instead of re-deriving signatures
    over the whole history (see incremental_neardup_filter_sig)."""
    if num_hashes % bands:
        raise ValueError(f"num_hashes={num_hashes} not divisible by bands={bands}")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(
        docs, num_hashes=num_hashes, n=n, id_col=id_col,
        text_col=text_col, max_shingle_df=max_shingle_df,
        hash_family=hash_family,
    )
    sig_arr = F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)])
    if hash_family == "md5":
        # portable mode: raw ':'-joined band values ARE the bucket keys
        # (band hashing is only a width optimization) so a DuckDB twin
        # can rebuild the index verbatim — same trick as minhash_lsh_pairs
        band_cols = [
            F.concat_ws(
                ":", *[F.col(f"mh_{b * rows_per_band + j}").cast("string")
                       for j in range(rows_per_band)]
            ).alias(f"band_{b}")
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.xxhash64(
                *[F.col(f"mh_{b * rows_per_band + j}") for j in range(rows_per_band)]
            ).alias(f"band_{b}")
            for b in range(bands)
        ]
    banded = sig.select(F.col(id_col), sig_arr.alias("sig"), *band_cols)
    return banded.select(
        F.col(id_col),
        "sig",
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
    )


def incremental_neardup_filter_sig(
    new_docs: DataFrame,
    band_table: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
    hash_family: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental near-dup against a MAINTAINED signature index: drop
    new-batch documents whose estimated Jaccard to any indexed document
    reaches ``threshold``.

    ``max_bucket_size`` caps degenerate (band_idx, band_hash) buckets in
    the STORED index before the candidate join — without it, a hot bucket
    (e.g. millions of short near-identical docs sharing a band value in a
    100 TB history) turns the join quadratic in that bucket's size,
    undercutting the O(new + collisions) claim. Index rows in an over-cap
    bucket are excluded from candidate generation for this call (their
    docs simply can't be matched via that band), the same trade
    ``minhash_lsh_pairs`` makes. Default ``None`` preserves exact parity
    with the c38 oracle twin.

    Contrast with :func:`incremental_neardup_filter` (exact verification,
    re-derives the history shingle stream every call): here the history
    side is only the stored band table — candidates come from the band
    equi-join, and verification is the minhash AGREEMENT FRACTION
    (E[agreement] = Jaccard, the classic estimator), computed from the
    stored signatures alone. Per-ingest cost is O(new + collisions) with
    NO rescan of history text — the shape that holds when history is
    100 TB and the daily batch is 0.1% of it. Explicitly approximate:
    the estimate concentrates around true Jaccard with sd
    ~sqrt(J(1-J)/num_hashes); raise num_hashes to tighten.

    Returns the surviving new-batch rows."""
    if max_bucket_size is not None:
        band_table = _drop_hot_keys(
            band_table, ["band_idx", "band_hash"], max_bucket_size
        )
    new_bands = minhash_band_table(
        new_docs, num_hashes=num_hashes, bands=bands, n=n,
        id_col=id_col, text_col=text_col, max_shingle_df=max_shingle_df,
        hash_family=hash_family,
    )
    old = band_table.select(
        F.col(id_col).alias("old_id"),
        F.col("sig").alias("old_sig"),
        "band_idx",
        "band_hash",
    )
    new = new_bands.select(
        F.col(id_col).alias("new_id"), F.col("sig").alias("new_sig"),
        "band_idx", "band_hash",
    )
    candidates = (
        new.join(old, ["band_idx", "band_hash"])
        .select("new_id", "new_sig", "old_id", "old_sig")
        .distinct()
    )
    agreement = F.size(
        F.filter(
            F.zip_with("new_sig", "old_sig", lambda a, b: a == b),
            lambda x: x,
        )
    ) / F.lit(num_hashes)
    dups = (
        candidates.withColumn("est_jaccard", agreement)
        .filter(F.col("est_jaccard") >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_docs.join(dups, id_col, "left_anti")


def duplicated_passages(
    docs: DataFrame,
    min_len: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = None,
) -> DataFrame:
    """C2: MAXIMAL duplicated-passage extraction — the relational form of
    exact-substring dedup (the suffix-array construction of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    every token span of length >= ``min_len`` occurring in >= ``min_docs``
    distinct documents is duplicated, and overlapping/adjacent duplicated
    windows merge into their MAXIMAL span — the exact byte ranges an
    exact-substring deduper would cut, not just a per-source ratio
    (that cheaper rollup is ``c40_repeated_ngram_spans``).

    Output: (doc_id, start_pos, end_pos, n_tokens) with 1-based inclusive
    token positions.

    Plan shape at 100 TB: one corpus scan builds the positioned
    ``min_len``-gram stream (Catalyst sequence/transform/slice lambdas,
    no Python); gram -> distinct-doc-count is ONE shuffle on the gram key
    computed as dense_rank+max windows over the gram partition — the
    window buffer is Spark's spill-backed row array, so even a
    boilerplate gram shared by millions of docs spills rather than OOMs
    (this index IS the dedup structure — same posture as the minhash band
    table, never an all-pairs stage); the island merge
    (pos - row_number) runs in a PER-DOCUMENT window, bounded by document
    length. ``max_gram_df`` additionally drops degenerate boilerplate
    grams (license headers) via the standard hot-list anti-join before
    they fan out.
    """
    # tokenize ONCE into a projected column: referencing split(text)
    # inside the slice lambda re-splits the document per window position
    # (the measured 3.7x shingles lesson above). NOT widened (r11): the
    # A/B at sf0.1 read widen +0.07 s — the gram explode here feeds the
    # gram-key window shuffle immediately, so the serial span is short
    # and the exchange never pays for itself (contrast shingles(), whose
    # consumers hash/aggregate heavily before their first shuffle).
    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__w"))
    w = F.col("__w")
    # sequence(a, b) counts DOWN when b < a — short docs get no windows
    idx = F.when(
        F.size(w) >= min_len, F.sequence(F.lit(1), F.size(w) - (min_len - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.array_join(F.slice(w, i, min_len), " ").alias("gram"),
                ),
            )
        ).alias("g"),
    ).select(id_col, "g.pos", "g.gram")
    if max_gram_df:
        grams = _drop_hot_keys(grams, ["gram"], max_gram_df)
    # distinct-doc count per gram as a WINDOW over the gram partition:
    # one shuffle of the gram stream and one evaluation of the explode/
    # slice projection, vs the aggregate-then-self-join form's two of
    # each (measured ~35% of c45's wall time at sf0.1). dense_rank over
    # (gram ORDER BY doc_id) then max over the same partition = distinct
    # doc count WITHOUT materializing a per-gram set on the heap (the
    # earlier collect_set form built an in-memory set per gram — a
    # boilerplate gram shared by millions of docs would OOM); WindowExec
    # buffers rows in a spillable array, so a hot gram spills instead.
    # Both windows share the gram partitioning: one Exchange, one sort.
    wd = Window.partitionBy("gram").orderBy(id_col)
    wg = Window.partitionBy("gram")
    dup = (
        grams.withColumn("__dr", F.dense_rank().over(wd))
        .withColumn("__gdocs", F.max("__dr").over(wg))
        .filter(F.col("__gdocs") >= min_docs)
        .select(id_col, "pos")
    )
    # gaps-and-islands per document: consecutive duplicated window starts
    # share (pos - row_number); each island covers [min_pos, max_pos+L-1]
    wseq = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        dup.withColumn("__isl", F.col("pos") - F.row_number().over(wseq))
        .groupBy(id_col, "__isl")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + (min_len - 1)).alias("end_pos"),
        )
    )
    return spans.select(
        id_col,
        F.col("start_pos").cast("int").alias("start_pos"),
        F.col("end_pos").cast("int").alias("end_pos"),
        (F.col("end_pos") - F.col("start_pos") + 1).cast("int").alias("n_tokens"),
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    PPJoin/AllPairs family — Chaudhuri et al. ICDE'06, Xiao et al.
    WWW'08; public algorithms): all document pairs with shingle-set
    Jaccard >= ``threshold``, with NO df cap and NO approximation.

    Contrast the two existing near-dup paths: ngram_jaccard_pairs is
    exact over a CAPPED shingle universe (boilerplate shingles dropped),
    minhash_lsh_pairs is probabilistic. Prefix filtering gets exactness
    AND a sub-quadratic candidate set from a theorem instead of a cap:
    order every document's shingles by the global (df, shingle) order
    (rarest first) and call its first |d| - ceil(t*|d|) + 1 shingles the
    PREFIX; any pair with J >= t must share a prefix shingle (if the
    rarest intersection shingle of A∩B sat outside A's prefix, the whole
    intersection would fit in A's suffix of size ceil(t|A|)-1 < t|A| <=
    |A∩B| — contradiction, and symmetrically for B). So the equi-join
    runs over PREFIX streams only — rare shingles by construction, tiny
    fanout — and candidates are verified with a candidate-proportional
    intersection count, never the full quadratic join. The DuckDB twin
    is the UNCAPPED brute-force join, so a hash match at fixture scale
    certifies the filter's completeness, not just its own construction.

    Scale: one corpus scan per branch (the df aggregate re-derives the
    map-only shingle stream), a map-side-collapsing df groupBy
    broadcast-joined onto the stream (r12 — this replaced the r11 df
    COUNT WINDOW, a full shingle-stream exchange + sort; r11 itself had
    replaced a df groupBy + distributed-prefix-sum dense-id assignment
    + attach join: the dense ids existed only to narrow the verify
    arrays, but intersecting the shingle strings directly is
    candidate-proportional anyway and dropping the id machinery saved
    four exchanges and a checkpoint per call; the heavier string
    elements are a conscious trade, revisit if a corpus with very long
    shingles shows up), then
    ONE per-doc groupBy collapsing each doc's (df, shingle) pairs into
    a sorted array whose POSITION is the global-rarity rank (r11, the
    c82 shape — the row_number/doc-count windows and the separate
    verify-array aggregation fold into this aggregate; the persisted
    multi-consumer is the per-DOC array frame, corpus-sized), the
    prefix equi-join with the PPJoin positional filter applied AT
    candidate aggregation, then a verify join that is
    candidate-PROPORTIONAL: each surviving pair fetches two sorted
    shingle arrays and intersects them JVM-side via array_intersect —
    never the O(|cand| x doc_len) row expansion (measured to spill
    >80 GB on a dense-df 10x fixture; SCALE.md round-7). A boilerplate shingle shared by f docs lands in
    prefixes only for docs where it ranks inside the top
    |d|-ceil(t|d|)+1 RAREST — at a realistic t (>= 0.5) a hot shingle
    is almost never in any prefix, so the f² blowup the df cap guards
    against elsewhere cannot happen here; when the WHOLE df distribution
    is dense (no rare shingles exist), candidates grow and the
    positional filter + array verify keep the cost linear in the
    candidate count.

    Output: (doc_a, doc_b, inter, jaccard) with doc_a < doc_b,
    jaccard rounded 6 dp (filtering happens on the raw double, computed
    identically in both engines).
    """
    # spread_key (r12): the per-doc array fold below is the stream's
    # full-width consumer — hash(id) on the document rows replaces the
    # shingle-stream exchange its groupBy would otherwise insert.
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col, spread_key=True)
    # df via a map-side-collapsing groupBy + broadcast join (r12; guide
    # §2.3, §3.1 — the c82 shape): the r11 form stamped df with a COUNT
    # WINDOW over the shingle key, pushing the whole (doc, shingle)
    # stream through an exchange + sort. Each (doc, shingle) row is
    # unique (shingles() dedups per doc), so df = count per shingle — a
    # groupBy whose partial aggregation collapses to per-partition
    # distinct shingles before its (tiny) exchange, broadcast-joined
    # back onto the stream. The df branch re-derives the map-only
    # shingle stream (scan + split + slices — no exchange in its
    # lineage, so nothing to reuse); A/B'd against the window form at
    # sf0.1: the second shingle pass costs less than the full-stream
    # exchange + sort it replaces. The (df, shingle) pairs then
    # collapse into ONE sorted struct array per doc (r11, the c82
    # shape): the global-rarity rank is the array POSITION, and the
    # persisted multi-consumer is the per-DOC array frame — corpus
    # rows, not shingle-stream rows.
    sh_df = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    docarr = scoped_persist(
        sh.join(F.broadcast(sh_df), "shingle")
        .groupBy(F.col(id_col).alias("__id"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("shingle")))
            ).alias("__arr")
        )
        .select("__id", "__arr", F.size("__arr").alias("n_sh"))
    )
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + F.lit(1)
    ).cast("int")
    prefix = docarr.select(
        "__id",
        "n_sh",
        F.posexplode(F.slice("__arr", F.lit(1), prefix_len)).alias(
            "pos", "__pt"
        ),
    ).select(
        F.col("__id").alias(id_col),
        "n_sh",
        (F.col("pos") + 1).alias("rnk"),
        F.col("__pt.shingle").alias("shingle"),
    )
    a = prefix.select(
        F.col(id_col).alias("doc_a"),
        "shingle",
        F.col("rnk").alias("ia"),
        F.col("n_sh").alias("pna"),
    )
    b = prefix.select(
        F.col(id_col).alias("doc_b"),
        "shingle",
        F.col("rnk").alias("ib"),
        F.col("n_sh").alias("pnb"),
    )
    # candidate aggregation replaces the old distinct at identical
    # shuffle cost and adds the PPJoin positional filter: with both
    # shingle lists sorted by the SAME global (df, shingle) order, every
    # common shingle ordered before the pair's LAST shared prefix
    # shingle lies inside both prefixes (positions < max rank <= prefix
    # length), hence is already counted in s — so
    #   overlap <= s + min(n_a - max_ia, n_b - max_ib).
    # Pairs whose bound cannot reach the threshold overlap
    # t/(1+t)*(n_a+n_b) are pruned BEFORE verification (epsilon-guarded
    # on the safe side, so completeness is preserved).
    cand = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("s"),
            F.max("ia").alias("mi"),
            F.max("ib").alias("mj"),
            F.max("pna").alias("bna"),
            F.max("pnb").alias("bnb"),
        )
        .filter(
            (F.lit(1.0 + threshold))
            * (
                F.col("s")
                + F.least(
                    F.col("bna") - F.col("mi"), F.col("bnb") - F.col("mj")
                )
            ).cast("double")
            >= F.lit(threshold)
            * (F.col("bna") + F.col("bnb")).cast("double")
            - F.lit(1e-9)
        )
        .select("doc_a", "doc_b")
    )
    # candidate-proportional verify: per-doc SORTED shingle arrays
    # attach via two equi-joins and the exact intersection runs
    # JVM-side in array_intersect — O(|cand|) rows, never the old
    # O(|cand| x doc_len) expansion whose sort spill exhausted local
    # disk on a dense-df corpus (10x fixture, SCALE.md round-7 entry).
    # The arrays come straight off the persisted per-doc frame — the
    # struct array projects to its shingle components in place (order
    # is (df, shingle) instead of lexicographic; array_intersect is
    # order-independent, and shingles are unique per doc).
    arrays = docarr.select(
        F.col("__id").alias(id_col),
        F.expr("transform(__arr, x -> x.shingle)").alias("sids"),
        "n_sh",
    )
    arr_a = arrays.select(
        F.col(id_col).alias("doc_a"),
        F.col("sids").alias("sa"),
        F.col("n_sh").alias("n_a"),
    )
    arr_b = arrays.select(
        F.col(id_col).alias("doc_b"),
        F.col("sids").alias("sb"),
        F.col("n_sh").alias("n_b"),
    )
    inter_col = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    jacc = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        cand.join(arr_a, "doc_a")
        .join(arr_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter_col.cast("long").alias("inter"),
            "n_a",
            "n_b",
        )
        .filter(jacc >= F.lit(threshold))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            round6_bin(jacc).alias("jaccard"),
        )
    )


def edit_distance_pairs(
    docs: DataFrame,
    k: int,
    q: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 0,
) -> DataFrame:
    """EXACT edit-distance self-join (Ed-Join family — Gravano et al.
    VLDB'01 count filter, Xiao et al. VLDB'08 prefix filter; public
    algorithms): all document pairs with Levenshtein distance <= ``k``,
    complete by theorem — no blocking heuristic, no approximation.

    Contrast :func:`fuzzy_name_pairs`, which blocks on the last token —
    a recall HEURISTIC (a pair disagreeing in its final token is never
    compared). Here candidates come from positional q-gram theory, so
    the brute-force DuckDB twin certifies completeness on real data:

    1. Every string maps to its multiset of character q-grams, made a
       SET by occurrence-numbering duplicates (gram#1, gram#2, ...) —
       the standard multiset-to-set encoding, so array ops below keep
       exact multiset semantics on repetitive text ("batch batch ...").
    2. COUNT FILTER: one edit destroys at most q grams, so
       ed(a,b) <= k implies |Ga ∩ Gb| >= max(|Ga|, |Gb|) - q*k.
    3. PREFIX FILTER: order every doc's grams by the global (df, gram)
       rarity order and call its first q*k + 1 grams the prefix. If two
       docs share NO prefix gram, their overlap fits inside one doc's
       suffix of size |G| - (q*k + 1), i.e. overlap <= |G| - q*k - 1
       < |G| - q*k — violating the count filter. So every true pair
       with a POSITIVE count bound shares a prefix gram, and the
       candidate join runs over PREFIX streams only (each doc's q*k+1
       globally-RAREST grams). Pairs where BOTH docs have <= q*k grams
       make the bound vacuous and come from the dedicated short-band
       length-bucket join below instead (completeness hole caught by
       the hypothesis brute-force twin, round 8).
    4. Candidates pass the LENGTH filter (||a|-|b|| <= k) and the
       PPJoin POSITIONAL filter (overlap <= s + min(n_a - max_ia,
       n_b - max_ib); Xiao et al. WWW'08, the same bound c72's sweep
       test certifies) AT CANDIDATE AGGREGATION — integer comparisons
       on the (doc_a, doc_b) groupBy, BEFORE anything heavy attaches.
       Survivors then fetch two sorted occurrence-token arrays, pass
       the full count filter via ``array_intersect``
       (candidate-proportional, never an O(|cand| x doc_len) row
       expansion), and finally the exact JVM-side ``levenshtein`` <= k.

    Scale: one corpus scan (widened before the gram explode — the
    per-doc q-gram generation is the operator's densest per-row work
    and a compact file otherwise runs it on 1-2 cores), ONE gram-keyed
    occurrence-count shuffle shared by both consumers (r11 removed a df
    groupBy + distributed-prefix-sum dense-id assignment + two attach
    joins — the dense ids existed only to make the verify arrays
    narrow, but the occurrence-numbered grams are themselves short
    fixed-width strings, so intersecting THEM directly costs almost the
    same per element and saves four exchanges plus a checkpoint per
    call, measured 9.9s -> 5.7s at sf0.1, identical 106 output pairs;
    r12 then replaced the r11 df COUNT WINDOW — a second full
    token-stream exchange + sort — with a map-side-collapsing df
    groupBy broadcast-joined back, see the inline comment), then ONE
    per-doc groupBy collapsing each doc's (df, tok) pairs into a sorted
    array whose POSITION is the global-rarity rank (r11 again: the
    row_number window and the separate per-side verify-array
    aggregations fold into this one aggregate; the persisted
    multi-consumer is the per-DOC array frame, corpus-sized, not the
    token stream), a prefix equi-join filtered at aggregation, and a
    verify stage linear in SURVIVING candidates. Filter order
    matters measurably: the 10x scale step (SCALE.md round-7 batch-11)
    showed this corpus's q-gram df distribution is DENSE at every q
    (tiny synthetic vocabulary — max df grew 10x with the corpus, for
    q in {3,5,7}), so raw prefix-join pairs grew quadratically (652k ->
    68.7M) and attaching arrays to raw candidates spilled 58 GB; with
    the length + positional filters pushed into the aggregation the
    attach set is 12-15x smaller, and the exact count filter then kills
    >99.7% of what remains before the O(len^2) DP (measured 43,128 ->
    103 at sf0.1). On a natural-text corpus rare grams exist and the
    prefix join itself stays near-linear; the dense-vocab case is the
    adversarial floor, where the right tool shifts to the capped/LSH
    near-dup family. Strings shorter than q have no grams and are
    excluded (caller guards; the registered query corpus has min
    length >> q).

    ``min_len`` is a caller-CERTIFIED lower bound on ``length(text)``
    (0 = no claim). When min_len > q*k + q - 1 the short band is empty
    by construction and its whole subplan (a second corpus scan, an
    explode and a self-join) is elided — the r8 completeness fix cost
    ~15% of c82's wall on a corpus whose length filter (200..400 chars)
    makes the band impossible. The bound must be a property of the
    input (e.g. the pushed-down length predicate that BUILT the
    corpus), never a guess: an understated min_len only wastes the
    empty subplan; an OVERSTATED one silently drops both-short pairs.

    Output: (doc_a, doc_b, dist) with doc_a < doc_b, dist <= k.
    """
    from sheetsetl_spark.operators.skew import spread_by_key

    base = docs.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
        F.length(text_col).alias("__len"),
    ).filter(F.col("__len") >= q)
    # occurrence-numbered q-grams: count each gram per doc, then explode
    # the occurrence sequence — one groupBy, no per-doc-gram window.
    # __len rides along in the group key (constant per doc) so the
    # length filter reaches candidate aggregation without a base join.
    # The document rows are hash-spread by __id BEFORE the explode
    # (r12, guide §2.4/§2.3): hash(__id) satisfies the clustered
    # distribution of BOTH downstream groupBys — the occurrence count
    # keyed (__id, __len, gram) and the per-doc array fold keyed
    # (__id, __len) — so the q-gram/token stream (~q× the text bytes)
    # crosses NO exchange at all; the compact document rows cross once.
    # This replaces the r11 round-robin widen (which only spread a
    # narrow scan and left both token-stream exchanges in place) and
    # subsumes its job: spread_by_key always repartitions to
    # max(cores, scan splits), so the gram generation still runs at
    # full width on a compactly-written file.
    grams = spread_by_key(base, ["__id"]).select(
        "__id",
        "__len",
        F.explode(
            F.expr(
                f"transform(sequence(1, __len - {q} + 1),"
                f" i -> substring(__text, i, {q}))"
            )
        ).alias("gram"),
    )
    toks = (
        grams.groupBy("__id", "__len", "gram")
        .agg(F.count("*").alias("occ_cnt"))
        .select(
            "__id",
            "__len",
            F.explode(F.expr("sequence(1, occ_cnt)")).alias("occ"),
            "gram",
        )
        .select(
            "__id",
            "__len",
            F.concat_ws("\x1f", "gram", F.col("occ").cast("string")).alias("tok"),
        )
    )
    # df via a map-side-combining groupBy + broadcast join (r12; guide
    # §2.3 "aggregate before you shuffle", §3.1): the r11 form computed
    # df as a COUNT WINDOW over the token key, which pushed the ENTIRE
    # occurrence-numbered token stream through an exchange + sort just
    # to stamp one integer on each row. Each (doc, tok) row is unique,
    # so df = count per tok — a groupBy whose partial aggregation
    # collapses the stream to per-partition distinct toks before the
    # exchange (shuffle bytes ~ |distinct grams x occ|, not |token
    # stream|), joined back as a broadcast build (char q-gram vocab is
    # |alphabet|^q-bounded times the occurrence tail — KBs at fixture
    # scale, broadcastable at corpus scale; if a corpus ever blows that
    # bound, the window form is the fallback). Both the df aggregate
    # and the token stream hang off the SAME occurrence-count exchange
    # (identical canonicalized subtree -> ReuseExchange), so the gram
    # generation and its shuffle run once. The (df, tok) pairs then
    # collapse into ONE sorted array per doc: the global-rarity rank is
    # the array POSITION (r11), and the per-doc frame — corpus rows,
    # not token rows — is the only multi-consumer and the only thing
    # persisted.
    tok_df = toks.groupBy("tok").agg(F.count("*").alias("df"))
    docarr = scoped_persist(
        toks.join(F.broadcast(tok_df), "tok")
        .groupBy("__id", "__len")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("tok")))
            ).alias("__arr")
        )
        .select("__id", "__len", "__arr", F.size("__arr").alias("n_g"))
    )
    prefix = docarr.select(
        "__id",
        "__len",
        "n_g",
        F.posexplode(F.expr(f"slice(__arr, 1, {q * k + 1})")).alias("pos", "__pt"),
    ).select(
        "__id",
        "__len",
        "n_g",
        (F.col("pos") + 1).alias("rnk"),
        F.col("__pt.tok").alias("tok"),
    )
    a = prefix.select(
        F.col("__id").alias("doc_a"),
        "tok",
        F.col("rnk").alias("ia"),
        F.col("n_g").alias("pna"),
        F.col("__len").alias("pla"),
    )
    b = prefix.select(
        F.col("__id").alias("doc_b"),
        "tok",
        F.col("rnk").alias("ib"),
        F.col("n_g").alias("pnb"),
        F.col("__len").alias("plb"),
    )
    # length filter on the join rows, positional filter on the group:
    # both grams lists sort by the same global (df, tok) order, so every
    # common token ordered before the pair's last shared prefix token is
    # itself counted in s — overlap <= s + min(n_a - max_ia, n_b -
    # max_ib). A true pair needs overlap >= max(n_a, n_b) - q*k, so the
    # integer comparison below prunes only provably-impossible pairs.
    cand = (
        a.join(b, "tok")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("pla") - F.col("plb")) <= F.lit(k))
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("__s"),
            F.max("ia").alias("__mi"),
            F.max("ib").alias("__mj"),
            F.max("pna").alias("__bna"),
            F.max("pnb").alias("__bnb"),
        )
        .filter(
            (
                F.col("__s")
                + F.least(
                    F.col("__bna") - F.col("__mi"), F.col("__bnb") - F.col("__mj")
                )
                >= F.greatest(F.col("__bna"), F.col("__bnb")) - F.lit(q * k)
            )
            # both-short pairs are owned ENTIRELY by the short-band path
            # (n_g <= q*k <=> len <= q*k + q - 1), so excluding them
            # here makes the two candidate streams provably DISJOINT —
            # the union below needs no corpus-wide distinct shuffle
            & ~(
                (F.col("__bna") <= F.lit(q * k))
                & (F.col("__bnb") <= F.lit(q * k))
            )
        )
        .select("doc_a", "doc_b")
    )
    # SHORT-BAND completeness path: the count bound overlap >=
    # max(n_a, n_b) - q*k is vacuous when BOTH docs have <= q*k grams
    # (len <= q*k + q - 1) — such a pair can be within distance k while
    # sharing ZERO grams ("alpha alpha" vs "beta beta" at k=8), so the
    # gram join alone is incomplete there (caught by the hypothesis
    # brute-force twin, r8). Mixed short-long true pairs always share a
    # prefix gram (required overlap >= n_long - q*k > 0), so only the
    # both-short band needs candidates of its own: a length-bucketed
    # equi-join (bucket width k+1; emitting each side to {b, b+1} makes
    # every pair within the |len diff| <= k filter collide on some
    # key). The band is bounded by construction — strings shorter than
    # (k+1)*q chars — and its worst case (every ultra-short string
    # matching every other) is the TRUE output being quadratic, not an
    # algorithmic miss. The verify-stage count filter below is a no-op
    # for these pairs (RHS <= 0), so levenshtein alone decides them.
    if min_len <= q * k + q - 1:
        short = base.filter(F.col("__len") <= F.lit(q * k + q - 1)).select(
            "__id", "__len", F.floor(F.col("__len") / F.lit(k + 1)).alias("__bk")
        )
        sa = short.select(
            F.col("__id").alias("doc_a"),
            F.col("__len").alias("sla"),
            F.explode(F.array(F.col("__bk"), F.col("__bk") + 1)).alias("__key"),
        )
        sb = short.select(
            F.col("__id").alias("doc_b"),
            F.col("__len").alias("slb"),
            F.explode(F.array(F.col("__bk"), F.col("__bk") + 1)).alias("__key"),
        )
        short_cand = (
            sa.join(sb, "__key")
            .filter(
                (F.col("doc_a") < F.col("doc_b"))
                & (F.abs(F.col("sla") - F.col("slb")) <= F.lit(k))
            )
            .select("doc_a", "doc_b")
            # a pair can collide on both its shared bucket keys (b AND
            # b+1): dedupe WITHIN the band only — it is bounded by the
            # length cutoff, never corpus-sized
            .distinct()
        )
        cand = cand.unionByName(short_cand)
    # verify arrays come straight off the persisted per-doc frame — the
    # struct array projects to its tok components in place (order is
    # (df, tok) instead of lexicographic; array_intersect is
    # order-independent, and toks are unique per doc)
    arrays = docarr.select(
        "__id",
        F.expr("transform(__arr, x -> x.tok)").alias("toks"),
        "n_g",
    )
    side = base.join(arrays, "__id")
    arr_a = side.select(
        F.col("__id").alias("doc_a"),
        F.col("toks").alias("ga"),
        F.col("n_g").alias("na"),
        F.col("__text").alias("ta"),
        F.col("__len").alias("la"),
    )
    arr_b = side.select(
        F.col("__id").alias("doc_b"),
        F.col("toks").alias("gb"),
        F.col("n_g").alias("nb"),
        F.col("__text").alias("tb"),
        F.col("__len").alias("lb"),
    )
    overlap = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    return (
        cand.join(arr_a, "doc_a")
        .join(arr_b, "doc_b")
        .filter(F.abs(F.col("la") - F.col("lb")) <= F.lit(k))
        .filter(overlap >= F.greatest("na", "nb") - F.lit(q * k))
        .withColumn("dist", F.levenshtein("ta", "tb"))
        .filter(F.col("dist") <= F.lit(k))
        .select("doc_a", "doc_b", F.col("dist").cast("long").alias("dist"))
    )


def substring_decontaminate(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    probe_col: str = "probe",
    return_pairs: bool = False,
) -> DataFrame:
    """Substring-level decontamination: training documents that contain
    any eval probe VERBATIM (the strictest leak check — an exact answer
    string embedded in a training doc, the case n-gram-overlap
    decontamination (:func:`decontaminate`) can dilute when the probe is
    short relative to the doc).

    Scale asymmetry (same as decontaminate): eval probes are small by
    nature — benchmarks are thousands of strings, the corpus is the
    100 TB side. The probe set broadcasts; the corpus streams through a
    broadcast nested-loop `contains` filter with NO shuffle of the
    corpus at all, and the output is proportional to the contaminated
    set. For probe sets too big to broadcast, the right tool switches
    to :func:`decontaminate`'s shingle equi-join (anchoring each probe
    on its rarest shingle) — documented, not implemented here, because
    it changes the match semantics from verbatim to approximate.

    Output: (id, n_probes_hit, probe_ids) — one row per contaminated
    doc; probe_ids is the sorted comma-joined id list (a STRING, so the
    row hash-compares engine-portably). Self-hits (a probe extracted
    from the doc itself) are the caller's concern: pass probes carrying
    a source-doc column and pre-filter, or accept reflexive matches.
    """
    p = F.broadcast(
        probes.select(
            F.col(probe_id_col).alias("__pid"), F.col(probe_col).alias("__probe")
        )
    )
    hits = corpus.select(id_col, text_col).join(
        p, F.expr(f"contains({text_col}, __probe)")
    ).select(id_col, "__pid")
    return hits if return_pairs else _agg_probe_hits(hits, id_col)


def _agg_probe_hits(pairs: DataFrame, id_col: str) -> DataFrame:
    """(id, __pid) hit pairs -> (id, n_probes_hit, probe_ids).

    Shared final aggregate of the substring-decontamination family, so
    callers that UNION pair streams from several detector paths (the
    streaming ingest gate routes short probes through the broadcast
    path and long ones through the anchored path) aggregate once with
    identical semantics: pids sort in their NATIVE type before the
    string join — a lexicographic sort of pre-stringified pids would
    order 10 before 9 and break parity with the single-path output.
    """
    return pairs.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_probes_hit"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("__pid")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("probe_ids"),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_cols: list[str],
    window: int = 4,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95 — the
    classic entity-resolution method): sort all records by a blocking
    key, then candidate-pair only records within ``window`` positions of
    each other. Complements the equi-blocking family (last-token blocks
    in :func:`fuzzy_name_pairs`, Fellegi-Sunter's agreement blocks):
    sorted neighborhoods catch near-misses that straddle block
    boundaries, because adjacency under the sort order IS the block.

    Distributed shape: the global rank comes from the prefix-sum
    decomposition (operators/prefix.py) — range-partitioned local ranks
    plus broadcast per-partition offsets — NEVER a single-partition
    window over the corpus. Pairing is rank arithmetic: each record
    explodes ``window - 1`` (rank + d) probes and equi-joins back on the
    rank, so the candidate stream is exactly (window-1) x |rows| rows —
    linear, skew-free (ranks are unique), and shuffled on an integer.

    ``sort_cols`` must end in a unique key (same contract as
    prefix_sum). Output: one row per candidate pair, with each side's
    ``payload_cols`` suffixed _a/_b plus the rank gap ``gap``.
    """
    from sheetsetl_spark.operators.prefix import prefix_sum

    payload = payload_cols or sort_cols
    ranked = prefix_sum(
        df.select(*dict.fromkeys([*sort_cols, *payload])),
        [F.col(c) for c in sort_cols],
        F.lit(1).cast("long"),
        out_col="__rank",
    )
    a = ranked.select(
        F.col("__rank"), *[F.col(c).alias(f"{c}_a") for c in payload]
    ).withColumn("__d", F.explode(F.expr(f"sequence(1, {window - 1})")))
    b = ranked.select(
        F.col("__rank").alias("__rank_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload],
    )
    return (
        a.withColumn("__rank_b", F.col("__rank") + F.col("__d"))
        .join(b, "__rank_b")
        .select(
            *[f"{c}_a" for c in payload],
            *[f"{c}_b" for c in payload],
            F.col("__d").cast("long").alias("gap"),
        )
    )


def substring_decontaminate_anchored(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    probe_col: str = "probe",
    return_pairs: bool = False,
) -> DataFrame:
    """Verbatim substring decontamination for probe sets TOO BIG TO
    BROADCAST — the scale path :func:`substring_decontaminate`'s
    docstring points to, made concrete.

    Anchoring theorem: if ``probe`` occurs verbatim (space-tokenized
    text) inside a doc, then every INTERIOR word of the probe — all but
    the first and last, which the char-level cut may have clipped —
    appears in the doc as a complete token, in sequence. So the probe's
    first interior word BIGRAM is a word bigram of the doc, and an
    equi-join on that anchor bigram finds every true containment.
    Probes with fewer than two interior words carry no anchor and are
    dropped (returned semantics cover the anchored subset; the caller
    routes short probes through the broadcast variant — they are few
    and cheap by definition).

    Shape at 100 TB: the exploded stream carries only ``(doc_id,
    anchor)`` — NOT the doc text. Carrying text through the explode
    replicated each doc once per distinct bigram, making shuffled bytes
    O(tokens_per_doc x doc_bytes) per doc (r7 advice); instead the
    anchor join yields candidate ``(doc_id, probe)`` pairs and the text
    is re-attached by a candidate-proportional equi-join on ``doc_id``
    before the ``contains`` verify — the same verify-stage shape as
    ``edit_distance_pairs``. The corpus is scanned twice (both scans
    linear, parquet-pruned); every shuffle is linear in ids + anchors
    or in candidates. A boilerplate anchor is exactly the hot-key case
    ``max_anchor_df``-style capping would handle (not needed at fixture
    scale; the verify is already candidate-proportional).

    Output: identical schema/semantics to
    :func:`substring_decontaminate` restricted to anchored probes —
    (id, n_probes_hit, probe_ids).
    """
    p = probes.select(
        F.col(probe_id_col).alias("__pid"),
        F.col(probe_col).alias("__probe"),
        F.split(F.col(probe_col), " ").alias("__pw"),
    ).filter(F.size("__pw") >= 4)
    anchored = p.select(
        "__pid",
        "__probe",
        F.concat_ws(
            " ", F.element_at("__pw", 2), F.element_at("__pw", 3)
        ).alias("__anchor"),
    )
    doc_bigrams = corpus.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    ).select(
        id_col,
        F.explode(
            F.array_distinct(
                F.expr(
                    "CASE WHEN size(__w) >= 2 THEN "
                    "transform(sequence(1, size(__w) - 1), "
                    "  i -> concat_ws(' ', __w[i-1], __w[i])) "
                    "ELSE array() END"
                )
            )
        ).alias("__anchor"),
    )
    # (doc, probe) pairs are unique by construction: the doc side emits
    # each distinct bigram once and each probe has exactly one anchor —
    # no distinct() needed, so the only shuffles are the anchor join,
    # the doc_id text re-attach, and the final per-doc aggregate.
    candidates = doc_bigrams.join(anchored, "__anchor").select(id_col, "__pid", "__probe")
    hits = (
        candidates.join(corpus.select(id_col, text_col), id_col)
        .filter(F.expr(f"contains({text_col}, __probe)"))
        .select(id_col, "__pid")
    )
    return hits if return_pairs else _agg_probe_hits(hits, id_col)

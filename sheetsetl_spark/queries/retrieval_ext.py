"""Round-7 batch-2 extensions, retrieval/corpus tier: hybrid RRF search
(lexical BM25 + dense cosine fused by reciprocal rank), MOSS-style
winnowing fingerprints, product-quantization ANN, BPE merge-candidate
statistics, deterministic A-ES weighted sampling, and time-decayed
aggregates — the remaining rungs of a production retrieval + dedup +
data-mix stack on top of c2/c3/c26/c19.

Every query is a Catalyst-only DataFrame program with a DuckDB oracle
twin following the registry determinism contract
(sheetsetl_spark/queries/__init__.py): float scores round to 6 dp
FIRST, then accumulate in exact DECIMAL where summed, and every
ordering carries an id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query

_RRF_TERMS = ("spark", "shuffle", "vector")
_RRF_POOL = 100
_RRF_K0 = 60


@query(
    "c53_hybrid_rrf_search",
    oracle=f"""
    WITH params AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(CAST(LEN(STRING_SPLIT(text, ' ')) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avgdl
      FROM documents
    ),
    term_rows AS (
      SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl,
             UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, ANY_VALUE(dl) AS dl, COUNT(*) AS tf
      FROM term_rows
      WHERE term IN ({", ".join(f"'{t}'" for t in _RRF_TERMS)})
      GROUP BY doc_id, term
    ),
    dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT tf.doc_id,
             ROUND(LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)),
                   6) AS c
      FROM tf JOIN dfc ON tf.term = dfc.term, params
    ),
    lex_scored AS (
      SELECT doc_id, CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS score
      FROM contrib GROUP BY doc_id
    ),
    lex_top AS (
      SELECT doc_id, lex_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rank
        FROM lex_scored
      ) WHERE lex_rank <= {_RRF_POOL}
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    d_scored AS (
      SELECT vec_id AS doc_id,
             LIST_DOT_PRODUCT(qv, embedding::DOUBLE[])
               / (SQRT(LIST_DOT_PRODUCT(qv, qv))
                  * SQRT(LIST_DOT_PRODUCT(embedding::DOUBLE[], embedding::DOUBLE[])))
               AS sim
      FROM embeddings, q WHERE vec_id <> 0
    ),
    dense_top AS (
      SELECT doc_id, dense_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS dense_rank
        FROM d_scored
      ) WHERE dense_rank <= {_RRF_POOL}
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, lex_rank, dense_rank,
             COALESCE(1.0 / ({_RRF_K0} + lex_rank), 0.0)
               + COALESCE(1.0 / ({_RRF_K0} + dense_rank), 0.0) AS rrf
      FROM lex_top l FULL OUTER JOIN dense_top d ON l.doc_id = d.doc_id
    )
    SELECT doc_id,
           FLOOR(rrf * 1000000.0 + 0.5) / 1000000.0 AS rrf_score,
           CAST(lex_rank AS INTEGER) AS lex_rank,
           CAST(dense_rank AS INTEGER) AS dense_rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM fused)
    WHERE rn <= 10
    """,
)
def c53_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3/C26 (retrieval tier): hybrid search — BM25 for the query bag
    {spark, shuffle, vector} and embedding-cosine for the stored query
    vector (vec_id 0), fused by reciprocal-rank fusion, k0=60
    (operators/retrieval.py::hybrid_rrf_search). Each retriever emits a
    bounded top-100 pool via TakeOrderedAndProject; fusion's windows and
    full-outer join run on those bounded pools only — the fusion cost is
    O(pool) regardless of corpus size."""
    from sheetsetl_spark.operators import retrieval

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return retrieval.hybrid_rrf_search(
        docs, emb, list(_RRF_TERMS), query_vec_id=0, k=10, pool=_RRF_POOL
    )


@query(
    "c54_winnowing_fingerprints",
    oracle="""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, LEN(w) - 5 + 1 AS n_grams, gs.pos,
             ARRAY_TO_STRING(w[gs.pos + 1 : gs.pos + 5], ' ') AS gram
      FROM toks, LATERAL (
        SELECT UNNEST(GENERATE_SERIES(0, LEN(w) - 5)) AS pos) gs
    ),
    keyed AS (
      SELECT doc_id, n_grams, pos,
             LPAD(CAST(('0x' || SUBSTRING(MD5(gram), 1, 15))::BIGINT AS VARCHAR),
                  19, '0')
               || LPAD(CAST(99999999 - pos AS VARCHAR), 8, '0') AS key
      FROM grams
    ),
    winmin AS (
      SELECT doc_id, n_grams, pos,
             MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
      FROM keyed
    ),
    selected AS (
      SELECT DISTINCT doc_id, n_grams, wkey
      FROM winmin WHERE pos <= n_grams - 4
    )
    SELECT doc_id,
           CAST(n_grams AS INTEGER) AS n_grams,
           CAST(n_grams - 4 + 1 AS INTEGER) AS n_windows,
           CAST(COUNT(*) AS INTEGER) AS n_fingerprints,
           CAST(COUNT(DISTINCT CAST(SUBSTRING(wkey, 1, 19) AS BIGINT))
                AS INTEGER) AS n_distinct_hashes,
           ROUND(COUNT(*) / CAST(n_grams - 4 + 1 AS DOUBLE), 6) AS fp_density
    FROM selected GROUP BY doc_id, n_grams
    """,
)
def c54_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/C4 (fingerprinting tier): MOSS winnowing over 5-gram 60-bit
    md5-prefix hashes, window w=4 (operators/text.py::
    winnow_fingerprints) — the local-fingerprint sketch guaranteeing any
    shared run of >= 8 tokens produces a shared fingerprint, at ~2/(w+1)
    expected density. The rightmost-min-per-window selection itself is
    hash-checked: both engines pick fingerprints via the same
    zero-padded (hash, inverted-pos) sort key, so a one-position
    selection drift flips the row hash."""
    from sheetsetl_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    return text_ops.winnow_fingerprints(docs, k=5, w=4)


# 64 codebook entries per subspace, ids valid at every SF (< 500);
# 7 coprime to 499 makes the stride hit 64 distinct ids.
_PQ_SEEDS = tuple((3 + 7 * j) % 499 for j in range(64))


@query(
    "c55_topk_cosine_pq",
    oracle=f"""
    WITH base AS (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    ),
    unit AS (
      SELECT vid,
             LIST_TRANSFORM(v, x -> x / SQRT(LIST_DOT_PRODUCT(v, v))) AS u
      FROM base
    ),
    seeds(seed_id, j) AS (VALUES
      {", ".join(f"({sid}, {j})" for j, sid in enumerate(_PQ_SEEDS))}),
    subs AS (
      SELECT vid, gs.s, u[gs.s * 8 + 1 : gs.s * 8 + 8] AS sv
      FROM unit, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS s) gs
    ),
    codebook AS (
      SELECT j, sb.s AS cs, sb.sv AS cv,
             LIST_DOT_PRODUCT(sb.sv, sb.sv) AS bb
      FROM subs sb JOIN seeds ON sb.vid = seed_id
    ),
    enc AS (
      SELECT vid, s, CAST(MIN(key) % 100 AS INTEGER) AS code
      FROM (
        SELECT sb.vid, sb.s,
               (CAST(FLOOR((bb - 2 * LIST_DOT_PRODUCT(sv, cv))
                           * 1000000.0 + 0.5) AS BIGINT) + 10000000)
                 * 100 + j AS key
        FROM subs sb JOIN codebook ON sb.s = cs
      ) GROUP BY vid, s
    ),
    qsub AS (SELECT s, sv AS qv FROM subs WHERE vid = 0),
    adc AS (
      SELECT cs, j, ROUND(LIST_DOT_PRODUCT(qv, cv), 6) AS contrib
      FROM qsub JOIN codebook ON qsub.s = cs
    ),
    scored AS (
      SELECT vid,
             CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) AS pq_score
      FROM enc JOIN adc ON enc.s = cs AND enc.code = adc.j
      WHERE vid <> 0 GROUP BY vid
    ),
    short AS (
      SELECT vid, pq_score FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY pq_score DESC, vid) AS srn
        FROM scored
      ) WHERE srn <= 50
    ),
    rer AS (
      SELECT sh.vid, sh.pq_score,
             LIST_DOT_PRODUCT(u, (SELECT u FROM unit WHERE vid = 0)) AS sim
      FROM short sh JOIN unit USING (vid)
    )
    SELECT vid AS neighbor_id,
           CAST(rn AS INTEGER) AS pq_rank,
           FLOOR(sim * 1000000.0 + 0.5) / 1000000.0 AS sim,
           pq_score
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY sim DESC, vid) AS rn
          FROM rer)
    WHERE rn <= 10
    """,
)
def c55_topk_cosine_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (ANN tier, 5th rung): product-quantization top-k cosine —
    8 subspaces x 64 sampled centroids, asymmetric-distance shortlist
    (50) + exact re-rank (operators/similarity.py::cosine_topk_pq).
    Codes are 6 bits/subspace = 6 bytes/vector vs 256 for raw floats,
    the memory-bound regime IVF/LSH don't reach. The codebook is
    rebuilt from the table by BOTH engines (sampled subvectors, seed
    ids in the query text), so encode, ADC scoring, and the re-rank are
    hash-checked end to end, not just the final ranking."""
    from sheetsetl_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_pq(emb, query_vec_id=0, seed_ids=list(_PQ_SEEDS))


@query(
    "c58_bpe_merge_candidates",
    oracle="""
    WITH words AS (
      SELECT term AS word, COUNT(*) AS wcnt FROM (
        SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
      ) GROUP BY term HAVING LEN(term) >= 2
    ),
    pair_stream AS (
      SELECT word, wcnt, SUBSTRING(word, g.i, 2) AS pair
      FROM words, LATERAL (
        SELECT UNNEST(GENERATE_SERIES(1, LEN(word) - 1)) AS i) g
    )
    SELECT pair, occurrences, n_words FROM (
      SELECT pair, CAST(SUM(wcnt) AS BIGINT) AS occurrences,
             CAST(COUNT(DISTINCT word) AS INTEGER) AS n_words,
             ROW_NUMBER() OVER (ORDER BY SUM(wcnt) DESC, pair) AS rn
      FROM pair_stream GROUP BY pair
    ) WHERE rn <= 20
    """,
)
def c58_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 (tokenizer-induction tier): the adjacent character-pair
    frequency table a BPE trainer's first merge round reads
    (operators/text.py::bpe_merge_candidates) — complements c4f (which
    APPLIES a BPE-ish segmentation) with the statistic that LEARNS one.
    Corpus collapses to vocabulary before the pair explosion, so the
    heavy stage is O(distinct words), not O(corpus tokens)."""
    from sheetsetl_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    return text_ops.bpe_merge_candidates(docs, top=20)


@query(
    "c61_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars AS weight,
             -LN((('0x' || SUBSTRING(MD5(CONCAT('ws:', CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT + 1)
                 / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE) AS key
      FROM documents
    )
    SELECT doc_id, weight,
           FLOOR(key * 1000000.0 + 0.5) / 1000000.0 AS ws_key
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY key ASC, doc_id) AS rn FROM keyed)
    WHERE rn <= 50
    """,
)
def c61_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix tier: deterministic weighted sampling without replacement —
    50 documents drawn with probability proportional to n_chars via the
    A-ES exponential race (operators/layout.py::weighted_sample).
    Complements c19 (integer-replication mix weights) and c7 (uniform
    stratified): this is the true without-replacement draw, and it is a
    pure function of (ids, weights, tag) — re-cuttable byte-identically
    on any cluster. No shuffle: per-row hashing + TakeOrdered."""
    from sheetsetl_spark.operators import layout

    docs = load_table(spark, sf_dir, "documents")
    return layout.weighted_sample(docs, "doc_id", "n_chars", k=50)


@query(
    "c62_time_decayed_agg",
    oracle="""
    WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS ad FROM events)
    SELECT event_type,
           CAST(SUM(CAST(FLOOR(value * EXP(-0.09902102579427789
                  * DATEDIFF('day', CAST(ts AS DATE), ad))
                  * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6)))
             AS DOUBLE) AS decayed_value,
           CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) / 1000000.0
                  AS DECIMAL(28,6))) AS DOUBLE) AS raw_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events, anchor
    GROUP BY event_type ORDER BY event_type
    """,
)
def c62_time_decayed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature tier: exponentially time-decayed event-value aggregate
    per event type, half-life 7 days anchored at the newest event date
    (operators/incremental.py::time_decayed_agg) — the recency-weighted
    rollup a feature store serves next to the raw total. One scan,
    broadcast anchor, one group shuffle."""
    from sheetsetl_spark.operators import incremental

    events = load_table(spark, sf_dir, "events")
    return incremental.time_decayed_agg(events, "event_type")

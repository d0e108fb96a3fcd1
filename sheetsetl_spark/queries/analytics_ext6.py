"""Round-7 batch-11 extensions, fuzzy-matching / retrieval-eval /
decontamination tier: exact edit-distance self-join (Ed-Join prefix +
count filters, c82), retrieval evaluation metrics (c83),
verbatim-substring decontamination in both broadcast (c84) and
anchored no-broadcast (c87) forms, sorted-neighborhood blocking (c85),
and the source-pair shingle-overlap matrix (c86).

Scale contracts (details in each operator's docstring):
- c82 candidates come only from prefix grams, with the length and
  PPJoin positional filters applied AT candidate aggregation; the
  brute-force DuckDB twin certifies completeness.
- c83 reduces over the bounded |queries| x k pool; nDCG gain terms
  accumulate as exact DECIMAL so the sum is order-independent.
- c84 broadcasts the probe side (fixed eval benchmarks); c87 is the
  equi-join path for corpus-scale probe sets — same answer, proven by
  a parity unit test and independent oracles.
- c85 pairs by global-rank arithmetic from the distributed prefix sum.
- c86's unit of work is the distinct (source, shingle) stream.

(Table snapshot diff and the one-pass column profiler this tier
complements live in analytics_ext.py::x46 and extensions.py::x9.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query

# Edit-distance join parameters: the corpus is the deterministic
# mid-length band (the seeded near-dup pairs have near-equal lengths, so
# the band keeps pairs together while bounding the brute-force oracle's
# O(n^2) DP cost at driver-gate scale).
_ED_K = 6
_ED_Q = 3
_ED_LO = 200
_ED_HI = 400


@query(
    "c82_edit_distance_join",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE n_chars BETWEEN {_ED_LO} AND {_ED_HI}
        AND length(text) >= {_ED_LO}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE abs(length(a.text) - length(b.text)) <= {_ED_K}
      AND levenshtein(a.text, b.text) <= {_ED_K}
    """,
)
def c82_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (near-dup tier): EXACT Levenshtein self-join via
    positional q-gram prefix + count filtering
    (operators/dedup.py::edit_distance_pairs, the Ed-Join family).
    Upgrades fuzzy_name_pairs' last-token blocking HEURISTIC to a
    completeness theorem: the oracle is the UNCAPPED brute-force
    levenshtein join, so the hash match certifies that candidates drawn
    only from each doc's q*k+1 rarest grams lose not one true pair.
    Reference parity: the reference engine has no fuzzy matching at all
    (SELECT delegation, reference src/loader.py:231) — this is the
    C-series entity-resolution extension at training-corpus scale."""
    from sheetsetl_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").between(_ED_LO, _ED_HI)
        # min_len certification must rest on the column the operator
        # MEASURES (length(text)), not on the n_chars == length(text)
        # corpus invariant (ADVICE r9): a metadata drift would silently
        # drop both-short pairs. The extra predicate is codegen'd on the
        # same scan, costs nothing, and mirrors the oracle exactly.
        & (F.length("text") >= _ED_LO)
    )
    # min_len is now CERTIFIED against the measured column: the
    # short-band subplan (strings <= q*k + q - 1 = 20 chars) is
    # provably empty and elided
    return dedup.edit_distance_pairs(docs, k=_ED_K, q=_ED_Q, min_len=_ED_LO)


@query(
    "c83_retrieval_metrics",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS ql, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, label AS cl, embedding::DOUBLE[] AS cv
          FROM embeddings),
    scored AS (
      SELECT q.query_id, q.ql, c.neighbor_id, c.cl,
             LIST_DOT_PRODUCT(qv, cv)
               / (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(cv, cv))) AS sim
      FROM c, q WHERE q.query_id <> c.neighbor_id
    ),
    topk AS (
      SELECT * FROM (
        SELECT query_id, ql, neighbor_id, cl,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS nn_rank
        FROM scored) r
      WHERE nn_rank <= 10
    ),
    agg AS (
      SELECT query_id,
             MIN(CASE WHEN cl = ql THEN nn_rank END) AS first_rel,
             SUM(CASE WHEN cl = ql THEN 1 ELSE 0 END) AS hits,
             SUM(CASE WHEN cl = ql
                 THEN CAST(ROUND(1.0 / LOG2(nn_rank + 1.0), 12) AS DECIMAL(28,12))
                 ELSE CAST(0 AS DECIMAL(28,12)) END) AS dcg
      FROM topk GROUP BY query_id
    ),
    tot AS (
      SELECT q.query_id, COUNT(*) AS n_rel
      FROM q JOIN embeddings e ON e.label = q.ql AND e.vec_id <> q.query_id
      GROUP BY q.query_id
    ),
    ic AS (
      SELECT i AS m,
             SUM(CAST(ROUND(1.0 / LOG2(i + 1.0), 12) AS DECIMAL(28,12)))
               OVER (ORDER BY i) AS idcg
      FROM generate_series(1, 10) g(i)
    )
    SELECT a.query_id,
           COALESCE(ROUND(1.0 / first_rel, 6), 0.0) AS rr,
           CAST(hits AS BIGINT) AS hits_at_k,
           ROUND(hits / 10, 6) AS precision_at_k,
           COALESCE(ROUND(hits / n_rel, 6), 0.0) AS recall_at_k,
           COALESCE(ROUND(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6), 0.0)
             AS ndcg_at_k
    FROM agg a
    LEFT JOIN tot USING (query_id)
    LEFT JOIN ic ON ic.m = LEAST(10, n_rel)
    """,
)
def c83_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (retrieval tier): offline retrieval evaluation — MRR,
    hits@10, precision@10, recall@10 of the exact cosine retriever (c3)
    against label-match ground truth
    (operators/retrieval.py::ranking_metrics). The eval side of the
    c3/c26/c53 retrievers and the c35 ANN-recall harness: c35 measures
    ANN vs exact, this measures exact vs TASK relevance. Reference
    parity: the reference has no retrieval stack (SELECT delegation,
    reference src/loader.py:231) — C-series extension."""
    from sheetsetl_spark.operators import retrieval, similarity

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    # the kNN kernel's 80-row output feeds several metric branches in
    # ranking_metrics — pinned so the corpus kernel runs once (scan
    # audit: 7 embeddings scans un-pinned, ReusedExchange caught 1)
    ranked = similarity.cosine_topk(emb, q, k=10).localCheckpoint(eager=False)
    lab_cnt = emb.groupBy("label").agg(F.count("*").alias("__lc"))
    ql = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("__ql"))
    rel = (
        ql.join(F.broadcast(lab_cnt), ql["__ql"] == lab_cnt["label"])
        .select("query_id", "__ql", (F.col("__lc") - 1).alias("n_relevant"))
        .join(
            emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("__cl")),
            F.col("__ql") == F.col("__cl"),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "n_relevant")
    )
    return retrieval.ranking_metrics(ranked, rel, k=10)


# Substring-decontamination probe construction: a deterministic 40-char
# excerpt from every ~97th document (the "eval benchmark" stand-in).
_PROBE_MOD = 97
_PROBE_POS = 61
_PROBE_LEN = 40
_PROBE_MIN_CHARS = 160


@query(
    "c84_substring_decontamination",
    oracle=f"""
    WITH p AS (
      SELECT doc_id AS probe_id, SUBSTRING(text, {_PROBE_POS}, {_PROBE_LEN}) AS probe
      FROM documents
      WHERE doc_id % {_PROBE_MOD} = 0 AND n_chars >= {_PROBE_MIN_CHARS}
    )
    SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_probes_hit,
           STRING_AGG(CAST(p.probe_id AS VARCHAR), ',' ORDER BY p.probe_id)
             AS probe_ids
    FROM documents d JOIN p ON CONTAINS(d.text, p.probe)
    GROUP BY d.doc_id
    """,
)
def c84_substring_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (decontamination tier): VERBATIM substring leak check —
    training docs containing any eval probe exactly
    (operators/dedup.py::substring_decontaminate). Strictest variant of
    c18's n-gram-overlap decontamination: a short answer string embedded
    in a long doc dilutes n-gram overlap below threshold but is still a
    leak; `contains` catches it. Probes broadcast (eval sets are small
    by nature); the corpus never shuffles. Reflexive hits (the probe's
    own source doc) are kept — they certify the extraction/match
    round-trip on both engines."""
    from sheetsetl_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(
        (F.col("doc_id") % _PROBE_MOD == 0) & (F.col("n_chars") >= _PROBE_MIN_CHARS)
    ).select(
        F.col("doc_id").alias("probe_id"),
        F.substring("text", _PROBE_POS, _PROBE_LEN).alias("probe"),
    )
    return dedup.substring_decontaminate(docs, probes)


_SN_WINDOW = 4
_SN_MAX_DIST = 15


@query(
    "c85_sorted_neighborhood",
    oracle=f"""
    WITH r AS (
      SELECT p_partkey, p_name,
             ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS rn
      FROM part
    )
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(b.rn - a.rn AS BIGINT) AS gap,
           CAST(LEVENSHTEIN(a.p_name, b.p_name) AS BIGINT) AS name_dist
    FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND {_SN_WINDOW - 1}
    WHERE LEVENSHTEIN(a.p_name, b.p_name) <= {_SN_MAX_DIST}
    """,
)
def c85_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (entity-resolution tier): sorted-neighborhood blocking
    (operators/dedup.py::sorted_neighborhood_pairs) over part names —
    candidates are records within w=4 positions under the (p_name,
    p_partkey) sort, scored by Levenshtein. Completes the blocking
    family: equi-blocks (c24 last-token, c78 Fellegi-Sunter agreement
    patterns) miss near-misses straddling block boundaries; sorted
    neighborhoods make adjacency itself the block. The global rank is
    the distributed prefix sum — no single-partition window."""
    from sheetsetl_spark.operators import dedup

    part = load_table(spark, sf_dir, "part")
    pairs = dedup.sorted_neighborhood_pairs(
        part, ["p_name", "p_partkey"], window=_SN_WINDOW,
        payload_cols=["p_partkey", "p_name"],
    )
    return (
        pairs.withColumn("name_dist", F.levenshtein("p_name_a", "p_name_b"))
        .filter(F.col("name_dist") <= _SN_MAX_DIST)
        .select(
            F.col("p_partkey_a").alias("part_a"),
            F.col("p_partkey_b").alias("part_b"),
            "gap",
            F.col("name_dist").cast("long").alias("name_dist"),
        )
    )


@query(
    "c86_source_overlap",
    oracle="""
    WITH toks AS (SELECT source, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT source, ARRAY_TO_STRING(w[i:i+2], ' ') AS shingle
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    sz AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
    pr AS (
      SELECT a.source AS group_a, b.source AS group_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT group_a, group_b, CAST(inter AS BIGINT) AS inter,
           CAST(na.n + nb.n - inter AS BIGINT) AS union_sz,
           ROUND(inter / (na.n + nb.n - inter), 6) AS jaccard
    FROM pr
    JOIN sz na ON na.source = group_a
    JOIN sz nb ON nb.source = group_b
    """,
)
def c86_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (corpus-profiling tier): pairwise exact shingle-Jaccard
    between SOURCES (operators/profiling.py::group_overlap_matrix) — the
    re-crawl/mirror report a curator reads before doc-level dedup. The
    quadratic term collapses to C(|sources|, 2); the unit of work is the
    distinct (source, shingle) stream, bounded by vocabulary x sources,
    not corpus size."""
    from sheetsetl_spark.operators.profiling import group_overlap_matrix

    docs = load_table(spark, sf_dir, "documents")
    return group_overlap_matrix(docs, n=3, group_col="source")


@query(
    "c87_anchored_decontamination",
    oracle=f"""
    WITH p0 AS (
      SELECT doc_id AS probe_id, SUBSTRING(text, {_PROBE_POS}, {_PROBE_LEN}) AS probe
      FROM documents
      WHERE doc_id % {_PROBE_MOD} = 0 AND n_chars >= {_PROBE_MIN_CHARS}
    ),
    p AS (SELECT probe_id, probe, STRING_SPLIT(probe, ' ') AS pw FROM p0),
    anch AS (
      SELECT probe_id, probe, pw[2] || ' ' || pw[3] AS anchor
      FROM p WHERE LEN(pw) >= 4
    ),
    db AS (
      SELECT DISTINCT doc_id, text, ARRAY_TO_STRING(w[i:i+1], ' ') AS anchor
      FROM (SELECT doc_id, text, STRING_SPLIT(text, ' ') AS w FROM documents) t,
           LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 1)) AS i) u
    ),
    hits AS (
      SELECT d.doc_id, a.probe_id
      FROM db d JOIN anch a USING (anchor)
      WHERE CONTAINS(d.text, a.probe)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_probes_hit,
           STRING_AGG(CAST(probe_id AS VARCHAR), ',' ORDER BY probe_id)
             AS probe_ids
    FROM hits GROUP BY doc_id
    """,
)
def c87_anchored_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (decontamination tier): the NO-BROADCAST scale path for
    verbatim substring decontamination
    (operators/dedup.py::substring_decontaminate_anchored) — probe sets
    too big to broadcast equi-join the corpus on each probe's first
    interior word bigram (complete by the anchoring theorem in the
    operator docstring), then `contains` verifies only anchor-colliding
    pairs. Same probe construction as c84; on probes with >= 2 interior
    words (all of them at this fixture's probe length) the result is
    IDENTICAL to c84's broadcast variant — asserted as a unit test, and
    both are driver-oracle-checked independently."""
    from sheetsetl_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(
        (F.col("doc_id") % _PROBE_MOD == 0) & (F.col("n_chars") >= _PROBE_MIN_CHARS)
    ).select(
        F.col("doc_id").alias("probe_id"),
        F.substring("text", _PROBE_POS, _PROBE_LEN).alias("probe"),
    )
    return dedup.substring_decontaminate_anchored(docs, probes)


@query(
    "c88_quantile_normalize",
    oracle="""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    g AS (SELECT n_chars AS gv,
                 ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS gr
          FROM d),
    r AS (SELECT doc_id, source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS r,
                 COUNT(*) OVER (PARTITION BY source) AS ng,
                 (SELECT COUNT(*) FROM d) AS n
          FROM d)
    SELECT r.doc_id, r.source, r.n_chars,
           CAST(g.gv AS BIGINT) AS norm_value
    FROM r JOIN g ON g.gr = CEIL(r.r * r.n / r.ng)
    """,
)
def c88_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (curation tier): quantile normalization of per-source
    doc lengths onto the global length distribution
    (operators/profiling.py::quantile_normalize) — the cross-source
    score calibration that makes one curation threshold mean the same
    thing for every source. Global ranks via the distributed prefix
    sum; everything integer-exact."""
    from sheetsetl_spark.operators.profiling import quantile_normalize

    docs = load_table(spark, sf_dir, "documents")
    return quantile_normalize(
        docs, group_col="source", value_col="n_chars", id_col="doc_id"
    )


@query(
    "c89_ewma_daily",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS dt
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(LIST_REDUCE(LIST_PREPEND(0.0, LIST(dt ORDER BY day)),
                             (acc, x) -> 0.5 * x + 0.5 * acc), 6) AS ewma
    FROM daily GROUP BY 1
    """,
)
def c89_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (monitoring tier): per-priority EWMA (alpha=0.5) of the
    DAILY order-revenue series (operators/incremental.py::ewma_by_key).
    The sequential recurrence runs as a JVM `aggregate` fold over the
    calendar-bounded day-sorted array per key; daily totals use the
    exact-decimal sum recipe, and the fold's defined left-to-right
    order makes the IEEE double chain bit-identical to the DuckDB
    list_reduce twin."""
    from sheetsetl_spark.operators.incremental import ewma_by_key

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("dt")
    )
    return ewma_by_key(
        daily, key_col="o_orderpriority", order_col="day", value_col="dt",
        alpha=0.5,
    )


def _mp_lsh_sql_parts(k: int = 10, num_planes: int = 16, bands: int = 4,
                      dim: int = 64) -> dict[str, str]:
    """Shared DuckDB CTE fragments for the multi-probe LSH twins: seeded
    signatures, single-probe and 1-perturbation query stacks, candidate
    sets, and exact-cosine top-k over each candidate set."""
    from sheetsetl_spark.operators.similarity import hyperplanes

    rpb = num_planes // bands
    bit_exprs = ", ".join(
        "CASE WHEN LIST_DOT_PRODUCT(["
        + ", ".join(repr(v) for v in row)
        + "]::DOUBLE[], v) > 0 THEN '1' ELSE '0' END"
        for row in hyperplanes(num_planes, dim)
    )
    band_vals = ", ".join(str(b) for b in range(bands))
    flips = ", ".join(
        f"SUBSTRING(bv, 1, {j - 1}) || "
        f"(CASE WHEN SUBSTRING(bv, {j}, 1) = '1' THEN '0' ELSE '1' END) || "
        f"SUBSTRING(bv, {j + 1}, {rpb - j})"
        for j in range(1, rpb + 1)
    )
    base = f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sig AS (SELECT vec_id, v, CONCAT({bit_exprs}) AS bits FROM e),
    bnd AS (SELECT UNNEST([{band_vals}]) AS b),
    cstack AS (SELECT vec_id, b, SUBSTRING(bits, b * {rpb} + 1, {rpb}) AS bv
               FROM sig, bnd),
    qstack AS (SELECT vec_id AS query_id, b, SUBSTRING(bits, b * {rpb} + 1, {rpb}) AS bv
               FROM sig, bnd WHERE vec_id < 8),
    qprobe AS (SELECT query_id, b, UNNEST([bv, {flips}]) AS bv FROM qstack),
    mp_cand AS (
      SELECT DISTINCT qk.query_id, c.vec_id AS neighbor_id
      FROM cstack c JOIN qprobe qk
        ON c.b = qk.b AND c.bv = qk.bv AND c.vec_id <> qk.query_id
    )"""
    topk = """
      SELECT query_id, neighbor_id, nn_rank, sim FROM (
        SELECT cand.query_id, cand.neighbor_id,
               LIST_DOT_PRODUCT(qe.v, ce.v)
                 / (SQRT(LIST_DOT_PRODUCT(qe.v, qe.v))
                    * SQRT(LIST_DOT_PRODUCT(ce.v, ce.v))) AS sim,
               ROW_NUMBER() OVER (PARTITION BY cand.query_id ORDER BY
                 LIST_DOT_PRODUCT(qe.v, ce.v)
                   / (SQRT(LIST_DOT_PRODUCT(qe.v, qe.v))
                      * SQRT(LIST_DOT_PRODUCT(ce.v, ce.v)))
                 DESC, cand.neighbor_id) AS nn_rank
        FROM {cand} cand
        JOIN e qe ON qe.vec_id = cand.query_id
        JOIN e ce ON ce.vec_id = cand.neighbor_id) t
      WHERE nn_rank <= {k}"""
    return {"base": base, "topk": topk, "k": str(k)}


_MP = _mp_lsh_sql_parts()


@query(
    "c90_topk_cosine_lsh_multiprobe",
    oracle=f"""
    WITH {_MP["base"]}
    SELECT query_id, neighbor_id, nn_rank, ROUND(sim, 6) AS sim
    FROM ({_MP["topk"].format(cand="mp_cand", k=_MP["k"])}) z
    """,
)
def c90_topk_cosine_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (ANN tier): multi-probe banded hyperplane LSH (Lv et
    al., VLDB'07) — each query band also probes its Hamming-1 buckets
    (operators/similarity.py::cosine_topk_lsh(multiprobe=True)), buying
    recall with query-side probes instead of more index tables; the
    corpus-side index is IDENTICAL to c3b's. Deterministic seeded
    planes, so the whole approximate pipeline hash-checks against its
    DuckDB twin."""
    from sheetsetl_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_lsh(
        emb, emb.filter(F.col("vec_id") < 8), k=10, multiprobe=True
    )


@query(
    "c91_multiprobe_recall",
    oracle=f"""
    WITH {_MP["base"]},
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 LIST_DOT_PRODUCT(qv, c.v)
                   / (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v)))
                 DESC, c.vec_id) AS nn_rank
        FROM e c, q WHERE q.query_id <> c.vec_id) t
      WHERE nn_rank <= 10
    ),
    sp_cand AS (
      SELECT DISTINCT qk.query_id, c.vec_id AS neighbor_id
      FROM cstack c JOIN qstack qk
        ON c.b = qk.b AND c.bv = qk.bv AND c.vec_id <> qk.query_id
    ),
    sp_topk AS ({_MP["topk"].format(cand="sp_cand", k=_MP["k"])}),
    mp_topk AS ({_MP["topk"].format(cand="mp_cand", k=_MP["k"])}),
    pool AS (
      SELECT 'lsh' AS method, query_id, neighbor_id FROM sp_topk
      UNION ALL
      SELECT 'lsh_multiprobe', query_id, neighbor_id FROM mp_topk
    ),
    m AS (SELECT DISTINCT method FROM pool)
    SELECT m.method, x.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(b.neighbor_id) AS BIGINT) AS n_hit,
           ROUND(COUNT(b.neighbor_id) / COUNT(*), 6) AS recall_at_k
    FROM exact x
    CROSS JOIN m
    LEFT JOIN pool b
      ON b.method = m.method AND b.query_id = x.query_id
     AND b.neighbor_id = x.neighbor_id
    GROUP BY m.method, x.query_id
    """,
)
def c91_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (ANN tier): recall@10 of single-probe vs multi-probe
    banded LSH against the exact top-k, per (method, query) — the
    measured evidence that Hamming-1 query probes lift recall at an
    unchanged corpus index (candidates are a strict superset, so
    multiprobe recall >= single-probe recall row-by-row; asserted as a
    unit test too). Extends the c35 validation loop."""
    from sheetsetl_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    # the exact kernel is the recall denominator for BOTH compared
    # methods — pinned so it runs once (scan audit: 8 embeddings scans)
    exact = (
        similarity.cosine_topk(emb, queries_df, k=10)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )

    def recall_of(approx: DataFrame, method: str) -> DataFrame:
        a = approx.select(
            F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
        )
        return (
            exact.join(
                a,
                (F.col("query_id") == F.col("a_qid"))
                & (F.col("neighbor_id") == F.col("a_nid")),
                "left",
            )
            .groupBy("query_id")
            .agg(
                F.count("*").cast("long").alias("n_exact"),
                F.count("a_nid").cast("long").alias("n_hit"),
                F.round(F.count("a_nid") / F.count("*"), 6).alias("recall_at_k"),
            )
            .select(F.lit(method).alias("method"), "*")
        )

    sp = recall_of(similarity.cosine_topk_lsh(emb, queries_df, k=10), "lsh")
    mp = recall_of(
        similarity.cosine_topk_lsh(emb, queries_df, k=10, multiprobe=True),
        "lsh_multiprobe",
    )
    return sp.unionByName(mp)


@query(
    "c92_word_dropout",
    oracle="""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    kept AS (
      SELECT doc_id, i, w[i] AS tok, LEN(w) AS n_orig
      FROM t, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w))) AS i) u
      WHERE ('0x' || SUBSTRING(MD5(CONCAT('aug', ':', CAST(doc_id AS VARCHAR),
               ':', CAST(i AS VARCHAR), ':', w[i])), 1, 8))::BIGINT % 10 <> 0
    )
    SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY i) AS aug_text,
           CAST(ANY_VALUE(n_orig) AS BIGINT) AS n_orig,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY doc_id
    """,
)
def c92_word_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (augmentation tier): deterministic ~10% word-dropout
    views of every document (operators/text.py::word_dropout) — the
    contrastive-training / robustness augmentation, seeded by the
    md5-prefix uniform so any cluster, partitioning, or engine
    regenerates the identical view. All array HOFs; the token stream
    never leaves its row."""
    from sheetsetl_spark.operators.text import word_dropout

    return word_dropout(load_table(spark, sf_dir, "documents"), denom=10)


@query(
    "c93_span_corruption",
    oracle="""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    tok AS (SELECT doc_id, i, w[i] AS tok
            FROM t, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w))) AS i) u),
    m AS (
      SELECT doc_id, i, tok,
             CASE WHEN (i - 1) % 5 <= 2 AND
               ('0x' || SUBSTRING(MD5(CONCAT('t5', ':', CAST(doc_id AS VARCHAR),
                  ':', CAST(i - ((i - 1) % 5) AS VARCHAR))), 1, 8))::BIGINT % 4 = 0
             THEN i - ((i - 1) % 5) END AS s
      FROM tok
    ),
    st AS (
      SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS k
      FROM (SELECT doc_id, s FROM m WHERE i = s) q
    ),
    j AS (
      SELECT m.doc_id, m.i, m.tok, m.s, st.k
      FROM m LEFT JOIN st ON st.doc_id = m.doc_id AND st.s = m.s
    ),
    pieces AS (
      SELECT doc_id, i, s,
        CASE WHEN s IS NULL THEN tok
             WHEN i = s THEN '<extra_id_' || CAST(k AS VARCHAR) || '>' END AS cp,
        CASE WHEN i = s THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || tok
             WHEN s IS NOT NULL THEN tok END AS tp
      FROM j
    )
    SELECT doc_id,
           COALESCE(STRING_AGG(cp, ' ' ORDER BY i), '') AS corrupted,
           COALESCE(STRING_AGG(tp, ' ' ORDER BY i), '') AS target,
           CAST(COUNT(*) FILTER (WHERE i = s) AS BIGINT) AS n_spans
    FROM pieces GROUP BY doc_id
    """,
)
def c93_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (augmentation tier): deterministic T5-style span
    corruption (operators/text.py::span_corruption) — ~1/4 of the
    grid-aligned 3-token spans mask to ordered <extra_id_k> sentinels,
    with the matching target sequence. Grid spacing > span length makes
    spans non-overlapping by construction; every aggregation is pinned
    to token order, so the output strings are identical on any
    partitioning and in the DuckDB twin."""
    from sheetsetl_spark.operators.text import span_corruption

    return span_corruption(load_table(spark, sf_dir, "documents"))


@query(
    "c94_quality_canonical_dedup",
    oracle="""
    WITH RECURSIVE
    toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+2], ' ') AS shingle
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON inter.doc_a = sa.doc_id
      JOIN sizes sb ON inter.doc_b = sb.doc_id
      WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, node) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.node = e.u
    ),
    comp AS (SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY src),
    q AS (
      SELECT doc_id,
             ROUND(CAST(0.4 AS DOUBLE) * CASE WHEN LENGTH(text) BETWEEN 100 AND 5000
                                              THEN 1 ELSE 0 END
                 + CAST(0.3 AS DOUBLE) * CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                       t -> t IN ('the','a','of','and','to','in'))) > 0 THEN 1 ELSE 0 END
                 + CAST(0.3 AS DOUBLE) * (LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))
                                          / LEN(STRING_SPLIT(text, ' '))), 6) AS quality
      FROM documents
    )
    SELECT c.cluster_id, c.doc_id, q.quality,
           CAST(ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                   ORDER BY q.quality DESC, c.doc_id) = 1
                AS INT) AS kept
    FROM comp c JOIN q USING (doc_id)
    """,
)
def c94_quality_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (dedup tier): QUALITY-canonical duplicate resolution —
    c2f keeps each cluster's min-id doc; real corpus dedup keeps the
    BEST doc. Connected components over the exact near-dup graph
    (operators/dedup.py::connected_components), joined with the c4b
    quality score; the keeper is the per-cluster argmax (quality DESC,
    doc_id tiebreak). Pairs come from the PREFIX-FILTERED exact Jaccard
    join (c72's generator — UNCAPPED, so the oracle is the pure
    brute-force pair set, and the scale shape is the positional-filter
    one: the first 10x run of this query with the df-capped c2
    generator took 209.9s on the dense fixture vs ~20s after the
    switch, SCALE.md batch-12/13). One keyed window over the tiny
    clustered subset; the DuckDB twin recomputes components with a
    genuine WITH RECURSIVE closure."""
    from sheetsetl_spark.operators import dedup
    from sheetsetl_spark.operators.text import quality_score
    from sheetsetl_spark.queries.extensions import _JACCARD_THRESHOLD
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.prefix_filter_jaccard_pairs(
        docs, threshold=_JACCARD_THRESHOLD, n=3
    ).select("doc_a", "doc_b")
    comp = dedup.connected_components(pairs, "doc_a", "doc_b")
    q = quality_score(docs).select("doc_id", "quality")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        comp.select(F.col("node").alias("doc_id"), "cluster_id")
        .join(q, "doc_id")
        .withColumn("kept", (F.row_number().over(w) == 1).cast("int"))
        .select("cluster_id", "doc_id", "quality", "kept")
    )


def _c95_oracle() -> str:
    """Composed twin: the three registered detector oracles, normalized
    to one (method, doc_id, n_evidence) report. Reusing the ORACLES
    strings verbatim keeps the dashboard's twin in lockstep with the
    detectors' — a drifted copy could silently diverge."""
    from sheetsetl_spark.queries import ORACLES

    ngram = ORACLES["c18_benchmark_decontamination"]
    verb = ORACLES["c84_substring_decontamination"]
    fp = ORACLES["c11_cross_source_contamination"]
    return f"""
    SELECT 'ngram_overlap' AS method, train_doc_id AS doc_id,
           CAST(n_shared_shingles AS BIGINT) AS n_evidence
    FROM ({ngram}) a
    UNION ALL
    SELECT 'verbatim_substring', doc_id, CAST(n_probes_hit AS BIGINT)
    FROM ({verb}) b
    UNION ALL
    SELECT 'exact_fingerprint', doc_id, CAST(cnt AS BIGINT)
    FROM (
      SELECT doc_id, COUNT(*) AS cnt FROM (
        SELECT doc_a AS doc_id FROM ({fp}) p1
        UNION ALL
        SELECT doc_b FROM ({fp}) p2
      ) u GROUP BY doc_id
    ) c
    """


@query("c95_contamination_report", oracle=_c95_oracle())
def c95_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (decontamination tier): the unified leak DASHBOARD — one
    (method, doc_id, n_evidence) report across all three detector
    families: n-gram overlap (c18, diluted-overlap leaks), verbatim
    substring (c84, short-answer leaks), exact normalized fingerprint
    across sources (c11, split leaks). Composes the REGISTERED
    callables and their oracles verbatim, so the dashboard can never
    drift from the detectors it summarizes — the report a curation run
    reviews before a training corpus ships."""
    from sheetsetl_spark.queries import QUERIES

    ngram = (
        QUERIES["c18_benchmark_decontamination"](spark, sf_dir)
        .select(
            F.lit("ngram_overlap").alias("method"),
            F.col("train_doc_id").alias("doc_id"),
            F.col("n_shared_shingles").cast("long").alias("n_evidence"),
        )
    )
    verb = (
        QUERIES["c84_substring_decontamination"](spark, sf_dir)
        .select(
            F.lit("verbatim_substring").alias("method"),
            "doc_id",
            F.col("n_probes_hit").cast("long").alias("n_evidence"),
        )
    )
    pairs = QUERIES["c11_cross_source_contamination"](spark, sf_dir)
    fp = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_evidence"))
        .select(F.lit("exact_fingerprint").alias("method"), "doc_id", "n_evidence")
    )
    return ngram.unionByName(verb).unionByName(fp)


_BUDGET_TOKENS = 2000


@query(
    "c96_token_budget_sample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
             ('0x' || SUBSTRING(MD5(CONCAT('budget', ':',
                CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= {_BUDGET_TOKENS}
    """,
)
def c96_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (mix-construction tier): per-source token-budget
    selection (operators/layout.py::token_budget_sample) — each source
    contributes a reproducible pseudo-random prefix of its docs until
    the running token count reaches the budget. The constraint a
    training recipe actually specifies (N tokens per source), vs c19's
    ratio weighting. Keyed running sum per source; md5-uniform order,
    engine-portable."""
    from sheetsetl_spark.operators.layout import token_budget_sample

    return token_budget_sample(
        load_table(spark, sf_dir, "documents"), budget_tokens=_BUDGET_TOKENS
    )


@query(
    "c97_kmv_distinct",
    oracle="""
    WITH t AS (SELECT lang, STRING_SPLIT(text, ' ') AS w FROM documents),
    s AS (
      SELECT DISTINCT lang,
             ('0x' || SUBSTRING(MD5(ARRAY_TO_STRING(w[i:i+2], ' ')), 1, 15))::BIGINT AS h
      FROM t, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    r AS (SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn
          FROM s),
    per AS (
      SELECT lang, COUNT(*) AS n_exact,
             MAX(CASE WHEN rn = 64 THEN h END) AS kth
      FROM r GROUP BY lang
    )
    SELECT lang, CAST(n_exact AS BIGINT) AS n_exact,
           ROUND(CASE WHEN kth IS NULL THEN CAST(n_exact AS DOUBLE)
                      ELSE 63.0 * POW(2.0, 60.0) / kth END, 2) AS n_est,
           ROUND(ABS(CASE WHEN kth IS NULL THEN CAST(n_exact AS DOUBLE)
                          ELSE 63.0 * POW(2.0, 60.0) / kth END - n_exact)
                 / n_exact, 6) AS rel_err
    FROM per
    """,
)
def c97_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (sketch tier): per-language KMV distinct-shingle sketch
    (operators/profiling.py::kmv_distinct) vs the exact count, error
    measured — the count-distinct sibling of c27's count-min pattern.
    The md5-prefix hash makes the ESTIMATE engine-portable, so even the
    approximate path hash-checks against DuckDB (HLL implementations
    can't: their hash and bias constants differ per engine)."""
    from sheetsetl_spark.operators.dedup import shingles
    from sheetsetl_spark.operators.profiling import kmv_distinct

    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(docs, n=3, id_col="lang")
    return kmv_distinct(sh, group_col="lang", value_col="shingle", k=64)


# The persisted-index search must return EXACTLY what the direct IVF
# operator returns (tests/test_ivf_index.py proves equality), so its
# oracle is the c3c IVF oracle verbatim: deterministic centroids
# (vec_id < 16), queries vec_id < 8, nprobe 4, k 10.
_IVF_ORACLE = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 16),
    asg AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT e.vec_id, e.v, cent.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 LIST_DOT_PRODUCT(v, cv)
                   / (SQRT(LIST_DOT_PRODUCT(v, v)) * SQRT(LIST_DOT_PRODUCT(cv, cv))) DESC,
                 cent.cent_id) AS rn
        FROM e, cent) t
      WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qv, cent_id FROM (
        SELECT e.vec_id AS query_id, e.v AS qv, cent.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 LIST_DOT_PRODUCT(v, cv)
                   / (SQRT(LIST_DOT_PRODUCT(v, v)) * SQRT(LIST_DOT_PRODUCT(cv, cv))) DESC,
                 cent.cent_id) AS rn
        FROM e, cent WHERE e.vec_id < 8) t
      WHERE rn <= 4
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             LIST_DOT_PRODUCT(qv, a.v)
               / (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(a.v, a.v))) AS sim
      FROM probes p JOIN asg a ON p.cent_id = a.cent_id
      WHERE p.query_id <> a.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS nn_rank
      FROM scored
    )
    SELECT query_id, neighbor_id, nn_rank, ROUND(sim, 6) AS sim
    FROM ranked WHERE nn_rank <= 10
"""


@query("c91b_persisted_ivf_search", oracle=_IVF_ORACLE)
def c91b_persisted_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (ANN tier): build-once / search-many over the PERSISTED
    IVF index (r9 verdict №5) — write the inverted lists as parquet
    partitioned by cent_id (operators/similarity.py::write_ivf_index),
    REOPEN them from disk, and serve a query batch through
    search_ivf_index, whose plan partition-prunes the index scan to the
    nprobe probed lists (PartitionFilters carry the literal cent_id
    probe set; plan-asserted in tests/test_ivf_index.py). This is the
    repeated-query-batch story at 100 TB: the corpus-sized assignment
    pass is paid once at build; every later batch reads nprobe/M of the
    index directories and nothing else. Deterministic end-to-end
    (centroids = vec_id < 16), so the whole persisted round-trip is
    hash-checked against the direct-IVF DuckDB oracle.

    The index lands at a FIXED per-(user, sf) path and is rewritten
    with mode=overwrite — repeated invocations (3 bench passes, oracle
    sweeps, pytest) reuse one directory instead of leaking an orphaned
    mkdtemp copy per run (ADVICE r10). Timing note: this query's bench
    wall is BUILD + WRITE + reopened SEARCH by design — it certifies
    the whole persisted round-trip; search_ivf_index alone is the
    1.9-3.5s/batch number in SCALE.md."""
    import getpass
    import hashlib
    import os
    import tempfile

    from sheetsetl_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    idx = os.path.join(
        tempfile.gettempdir(),
        f"sheetsetl_ivf_c91b_{getpass.getuser()}_{tag}",
    )
    similarity.write_ivf_index(emb, idx, num_centroids=16)
    queries_df = emb.filter(F.col("vec_id") < 8)
    return similarity.search_ivf_index(spark, idx, queries_df, k=10, nprobe=4)

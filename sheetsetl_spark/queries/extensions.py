"""C-series: LLM-data-pipeline extension queries (SURVEY §2-C).

Each entry wires an operator from ``sheetsetl_spark.operators`` to the
fixture tables. Oracles are full ANSI/DuckDB rewrites of the same
algorithm — including the ANN/SimHash paths, whose seeded internals
(hyperplane literals, md5-bit token hashes) are replicated verbatim in
the SQL twins so even the approximate pipelines are hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.functions.lits import lit_double_array
from sheetsetl_spark.operators import dedup, similarity, text
from sheetsetl_spark.queries import dsum, query

_JACCARD_THRESHOLD = 0.5
# Boilerplate-shingle document-frequency cap shared by the Spark operators
# and their DuckDB twins (Jaccard is computed over the capped universe on
# both sides). Far above any honest shingle df at fixture scale.
_SHINGLE_DF_CAP = 1000


@query(
    "c1_dedup_latest",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def c1_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: keyed exact dedup, latest-wins (the upsert/compaction shape)."""
    ev = load_table(spark, sf_dir, "events")
    deduped = dedup.exact_dedup(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    )
    return deduped.select("user_id", "event_id", "event_type", "value")


@query(
    "c2_ngram_jaccard",
    oracle=f"""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+2], ' ') AS shingle
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM sh0) t
      WHERE df <= {_SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) >= {_JACCARD_THRESHOLD}
    """,
)
def c2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: near-dup pairs by word-3-gram Jaccard (candidate generation via
    shingle equi-join — no cross join at any scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, threshold=_JACCARD_THRESHOLD, n=3, max_shingle_df=_SHINGLE_DF_CAP
    )


@query(
    "c2b_minhash_lsh",
    # The LSH pipeline verifies candidates by true Jaccard, so its output
    # equals the exact n-gram Jaccard result whenever banding recall is 1
    # (verified on the fixtures at sf0.001/sf0.01) — same oracle as c2.
    oracle=f"""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+2], ' ') AS shingle
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM sh0) t
      WHERE df <= {_SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) >= {_JACCARD_THRESHOLD}
    """,
)
def c2b_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: MinHash(32)+LSH(8 bands) near-dup candidates verified by true
    Jaccard — the 100 TB path (band equi-join instead of shingle join)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs,
        threshold=_JACCARD_THRESHOLD,
        num_hashes=32,
        bands=8,
        n=3,
        max_shingle_df=_SHINGLE_DF_CAP,
    )


@query(
    "c2f_dup_clusters",
    oracle=f"""
    WITH RECURSIVE
    toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+2], ' ') AS shingle
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM sh0) t
      WHERE df <= {_SHINGLE_DF_CAP}
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
      WHERE ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) >= {_JACCARD_THRESHOLD}
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
    comp AS (SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY src)
    SELECT doc_id, cluster_id,
           CAST(doc_id = cluster_id AS INT) AS is_canonical,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM comp
    """,
)
def c2f_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: duplicate-cluster resolution — connected components over the
    exact near-dup pair graph, with a canonical representative (min doc_id)
    per cluster. The keep-one-per-cluster step a corpus dedup actually
    ships: everything with is_canonical = 0 is dropped. The DuckDB twin
    computes the same components with a genuine WITH RECURSIVE
    reachability closure (the engine uses distributed min-label
    propagation — see operators/dedup.py::connected_components)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, threshold=_JACCARD_THRESHOLD, n=3, max_shingle_df=_SHINGLE_DF_CAP
    )
    comp = dedup.connected_components(pairs, "doc_a", "doc_b")
    return (
        comp.select(F.col("node").alias("doc_id"), "cluster_id")
        .withColumn("is_canonical", (F.col("doc_id") == F.col("cluster_id")).cast("int"))
        .withColumn("cluster_size", F.count("*").over(Window.partitionBy("cluster_id")))
    )


def _neardup_pert(dim: int = 64, scale: float = 0.01) -> list[float]:
    """Deterministic ±scale perturbation literal — shared by the Spark
    plan and the DuckDB oracle so the planted near-dups are identical."""
    from sheetsetl_spark.operators.similarity import hyperplanes

    return [scale * s for s in hyperplanes(1, dim, tag="sheetsetl-pert")[0]]


def _embedding_neardup_oracle(
    threshold: float, num_planes: int = 32, bands: int = 4, dim: int = 64
) -> str:
    """DuckDB twin of ``dedup.embedding_neardup_pairs`` over the planted
    corpus: same inlined hyperplanes, same banding, same exact-cosine
    verification — the approximate stage is deterministic, so the whole
    ANN-blocked pipeline is hash-checkable, not just rows-only."""
    from sheetsetl_spark.operators.similarity import hyperplanes

    rows_per_band = num_planes // bands
    pert = ", ".join(repr(v) for v in _neardup_pert(dim))
    bit_exprs = ",\n      ".join(
        "CASE WHEN LIST_DOT_PRODUCT(["
        + ", ".join(repr(v) for v in row)
        + "]::DOUBLE[], v) > 0 THEN '1' ELSE '0' END"
        for row in hyperplanes(num_planes, dim)
    )
    return f"""
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(generate_series(1, {dim}),
                            i -> (embedding::DOUBLE[])[i] + ([{pert}]::DOUBLE[])[i])
      FROM embeddings WHERE vec_id < 20
    ),
    sig AS (
      SELECT vec_id, v, CONCAT({bit_exprs}) AS bits FROM corpus
    ),
    stacked AS (
      SELECT vec_id, band_idx,
             SUBSTRING(bits, band_idx * {rows_per_band} + 1, {rows_per_band}) AS band_val
      FROM sig, (SELECT UNNEST(generate_series(0, {bands - 1})) AS band_idx)
    ),
    pairs AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM stacked a
      JOIN stacked b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                    AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT vec_a, vec_b,
             LIST_DOT_PRODUCT(ea.v, eb.v)
               / (SQRT(LIST_DOT_PRODUCT(ea.v, ea.v)) * SQRT(LIST_DOT_PRODUCT(eb.v, eb.v))) AS sim
      FROM pairs
      JOIN corpus ea ON vec_a = ea.vec_id
      JOIN corpus eb ON vec_b = eb.vec_id
    )
    SELECT vec_a, vec_b, ROUND(sim, 6) AS sim FROM scored WHERE sim >= {threshold}
    """


def _embedding_incremental_oracle(
    threshold: float, num_planes: int = 32, bands: int = 4, dim: int = 64
) -> str:
    """DuckDB twin of the c49 index-maintained incremental embedding
    dedup: rebuilds the stored band index verbatim (same inlined
    hyperplanes), the same planted new batch (perturbed near-dups of
    vec_id < 20 that must DROP, coordinate-rolled copies of 20 <= vec_id
    < 60 that must SURVIVE), the band equi-join, exact-cosine verify,
    and the anti-join."""
    from sheetsetl_spark.operators.similarity import hyperplanes

    rpb = num_planes // bands
    pert = ", ".join(repr(v) for v in _neardup_pert(dim))

    def bit_exprs(src: str) -> str:
        return ",\n      ".join(
            "CASE WHEN LIST_DOT_PRODUCT(["
            + ", ".join(repr(v) for v in row)
            + f"]::DOUBLE[], {src}) > 0 THEN '1' ELSE '0' END"
            for row in hyperplanes(num_planes, dim)
        )

    return f"""
    WITH hist AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    newb AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(generate_series(1, {dim}),
                            i -> (embedding::DOUBLE[])[i] + ([{pert}]::DOUBLE[])[i]) AS v
      FROM embeddings WHERE vec_id < 20
      UNION ALL
      SELECT vec_id + 2000000,
             list_transform(
               (embedding::DOUBLE[])[{dim - 6}:{dim}] || (embedding::DOUBLE[])[1:{dim - 7}],
               x -> -x) AS v
      FROM embeddings WHERE vec_id >= 20 AND vec_id < 60
    ),
    hsig AS (SELECT vec_id, v, CONCAT({bit_exprs('v')}) AS bits FROM hist),
    nsig AS (SELECT vec_id, v, CONCAT({bit_exprs('v')}) AS bits FROM newb),
    hstack AS (
      SELECT vec_id, v, band_idx,
             SUBSTRING(bits, band_idx * {rpb} + 1, {rpb}) AS band_val
      FROM hsig, (SELECT UNNEST(generate_series(0, {bands - 1})) AS band_idx)
    ),
    nstack AS (
      SELECT vec_id, v, band_idx,
             SUBSTRING(bits, band_idx * {rpb} + 1, {rpb}) AS band_val
      FROM nsig, (SELECT UNNEST(generate_series(0, {bands - 1})) AS band_idx)
    ),
    cand AS (
      SELECT DISTINCT n.vec_id AS new_id, n.v AS nv, h.vec_id AS old_id, h.v AS hv
      FROM nstack n
      JOIN hstack h ON n.band_idx = h.band_idx AND n.band_val = h.band_val
    ),
    dups AS (
      SELECT DISTINCT new_id FROM cand
      WHERE LIST_DOT_PRODUCT(nv, hv)
              / (SQRT(LIST_DOT_PRODUCT(nv, nv)) * SQRT(LIST_DOT_PRODUCT(hv, hv)))
            >= {threshold}
    )
    SELECT vec_id FROM newb
    WHERE vec_id NOT IN (SELECT new_id FROM dups)
    """


@query(
    "c49_incremental_embedding_neardup",
    oracle=_embedding_incremental_oracle(threshold=0.98),
)
def c49_incremental_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C49: index-maintained INCREMENTAL embedding near-dup — the vector
    twin of c38's signature index path. History vectors live in a stored
    hyperplane band index (operators/dedup.py::embedding_band_index,
    vectors ride along so verification is EXACT cosine, not a Hamming
    estimate); a new ingest batch is signatured, band-joined against the
    index, cosine-verified only on collisions, and anti-joined —
    O(new + collisions) per ingest with no history rescan, the shape an
    embedding-dedup pipeline needs when history is 100 TB and the daily
    batch is 0.1% of it. The planted batch makes both outcomes
    observable: perturbed copies of vec_id < 20 (sim ≈ 0.997) must DROP;
    NEGATED coordinate-rolled copies of 20 <= vec_id < 60 (an isometry,
    so near-orthogonal to everything) must SURVIVE. The negation exists
    because the 10x scale fixture (examples/make_sf1ish.py) replicates
    embeddings by coordinate rolls — replica 7 exactly equals a
    roll-by-7 plant, which silently turned every must-survive vector
    into a true duplicate and made the r8 10x point a vacuous rows=0
    (negation keeps the plant orthogonal to every roll of history)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert_lit = lit_double_array(_neardup_pert())
    planted = base.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.zip_with("embedding", pert_lit, lambda a, b: a + b).alias("embedding"),
    )
    rolled = base.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 60)).select(
        (F.col("vec_id") + F.lit(2000000)).alias("vec_id"),
        F.transform(
            F.concat(
                F.slice("embedding", 64 - 6, 7), F.slice("embedding", 1, 64 - 7)
            ),
            lambda x: -x,
        ).alias("embedding"),
    )
    newb = planted.unionAll(rolled)
    # Banding by the r9 value-space LAW, not a pinned literal: one cheap
    # metadata count feeds choose_banding — (32, 4) at every oracle SF
    # (n ≤ 20k, matching the static 32-plane oracle twin) and 16-bit
    # bands at the 200k 100x fixture without this call site knowing the
    # rule. Derived ONCE here and passed to both the index build and the
    # filter: the filter's derive-from-index path (num_planes=None) is
    # for REOPENED materialized indexes, where its header agg is a cheap
    # pruned scan — on this freshly-built in-process index it would
    # force a full extra evaluation of the signature pipeline (measured
    # +1.2s at sf0.1 bench when tried).
    planes, bands = dedup.choose_banding(base.count())
    index = dedup.embedding_band_index(base, num_planes=planes, bands=bands, dim=64)
    survivors = dedup.incremental_embedding_neardup_filter(
        newb, index, threshold=0.98, num_planes=planes, bands=bands, dim=64
    )
    return survivors.select("vec_id")


@query("c2e_embedding_neardup", oracle=_embedding_neardup_oracle(threshold=0.98))
def c2e_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: embedding-cosine near-dup — hyperplane-LSH blocking + exact
    cosine verify. The fixture embeddings are near-orthogonal (max natural
    pairwise sim ≈ 0.5), so the query plants deterministic perturbed
    copies of vec_id < 20 (ids +1e6, sim ≈ 0.997 to their source) and the
    operator must recover exactly those pairs via the band join."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    pert_lit = lit_double_array(_neardup_pert())
    planted = base.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.zip_with("embedding", pert_lit, lambda a, b: a + b).alias("embedding"),
    )
    corpus = base.unionAll(planted)
    # num_planes unpinned (r9 verdict №3): choose_banding sizes the band
    # value space from the corpus size — (32, 4) at every oracle SF
    # (the static oracle twin inlines 32 planes), 16-bit bands at the
    # 200k 100x fixture where 8-bit buckets spilled 78 GB. The size is
    # passed as n_rows computed from two RAW-scan counts (base + the
    # pushdown-filtered plant source): counting the derived union
    # itself would re-evaluate the zip_with plan just to size the
    # banding (ADVICE r10).
    n = base.count() + base.filter(F.col("vec_id") < 20).count()
    return dedup.embedding_neardup_pairs(corpus, threshold=0.98, n_rows=n)


@query(
    "c3c_topk_cosine_ivf",
    oracle="""
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
    """,
)
def c3c_topk_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 scale path #2: IVF ANN — deterministic coarse quantizer
    (centroids = vec_id < 16), nprobe=4 probed lists per query, exact
    cosine within probed lists only. Deterministic end-to-end, so the
    FULL approximate pipeline is hash-checked against DuckDB (the LSH
    variant c3b remains the rows-only twin)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    return similarity.cosine_topk_ivf(emb, queries_df, k=10, num_centroids=16, nprobe=4)


@query(
    "c2c_simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents
    ),
    h AS (
      SELECT doc_id, ('0x' || SUBSTRING(MD5(t), 1, 15))::BIGINT AS h FROM tok
    ),
    bits AS (
      SELECT doc_id, j,
             SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h, (SELECT UNNEST(GENERATE_SERIES(0, 59)) AS j) js
      GROUP BY 1, 2
    ),
    packed AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 AND j < 32 THEN (1::BIGINT << j) ELSE 0 END) AS lo,
             SUM(CASE WHEN s > 0 AND j >= 32 THEN (1::BIGINT << (j - 32)) ELSE 0 END) AS hi
      FROM bits GROUP BY 1
    )
    SELECT doc_id, CONCAT(to_hex(hi), ':', to_hex(lo)) AS simhash FROM packed
    """,
)
def c2c_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: SimHash fingerprints. Token hash = 60 bits of the md5 hex
    prefix — engine-portable, so the fingerprints themselves are
    hash-checked against DuckDB (the xxhash64 fast path stays the default
    in operators/dedup.py::simhash64 for production)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash64(docs, token_hash="md5")


@query(
    "c3_topk_cosine",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             LIST_DOT_PRODUCT(qv, cv)
               / (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(cv, cv))) AS sim
      FROM c, q WHERE q.query_id <> c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS nn_rank
      FROM scored
    )
    SELECT query_id, neighbor_id, nn_rank, ROUND(sim, 6) AS sim
    FROM ranked WHERE nn_rank <= 10
    """,
)
def c3_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: exact brute-force cosine top-10 for 8 query vectors (broadcast
    queries x streamed corpus; per-query top-k via window)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    return similarity.cosine_topk(emb, queries_df, k=10)


def _lsh_topk_oracle(k: int = 10, num_planes: int = 16, bands: int = 4, dim: int = 64) -> str:
    """DuckDB twin of ``similarity.cosine_topk_lsh``: the same inlined
    hyperplane signatures, BANDED (band_idx, band_val) candidate join
    (any-band-match OR-construction), and exact cosine over the distinct
    candidates — the approximate stage is seeded/deterministic, so the
    full ANN pipeline is hash-checkable (recall<1 vs exact is irrelevant;
    the oracle runs the identical algorithm)."""
    from sheetsetl_spark.operators.similarity import hyperplanes

    rpb = num_planes // bands
    bit_exprs = ", ".join(
        "CASE WHEN LIST_DOT_PRODUCT(["
        + ", ".join(repr(v) for v in row)
        + "]::DOUBLE[], v) > 0 THEN '1' ELSE '0' END"
        for row in hyperplanes(num_planes, dim)
    )
    band_vals = ", ".join(str(b) for b in range(bands))
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sig AS (SELECT vec_id, v, CONCAT({bit_exprs}) AS bits FROM e),
    bnd AS (SELECT UNNEST([{band_vals}]) AS b),
    cstack AS (SELECT vec_id, b, SUBSTRING(bits, b * {rpb} + 1, {rpb}) AS bv FROM sig, bnd),
    qstack AS (SELECT vec_id AS query_id, b, SUBSTRING(bits, b * {rpb} + 1, {rpb}) AS bv
               FROM sig, bnd WHERE vec_id < 8),
    cand AS (
      SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
      FROM cstack c JOIN qstack q ON c.b = q.b AND c.bv = q.bv AND c.vec_id <> q.query_id
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             LIST_DOT_PRODUCT(qe.v, ce.v)
               / (SQRT(LIST_DOT_PRODUCT(qe.v, qe.v)) * SQRT(LIST_DOT_PRODUCT(ce.v, ce.v))) AS sim
      FROM cand
      JOIN e qe ON qe.vec_id = cand.query_id
      JOIN e ce ON ce.vec_id = cand.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS nn_rank
      FROM scored
    )
    SELECT query_id, neighbor_id, nn_rank, ROUND(sim, 6) AS sim
    FROM ranked WHERE nn_rank <= {k}
    """


@query("c3b_topk_cosine_lsh", oracle=_lsh_topk_oracle())
def c3b_topk_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 scale path: random-hyperplane LSH bucketing + in-bucket exact
    cosine. The planes are seeded driver-side literals shared with the
    DuckDB oracle, so even this approximate path is hash-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    return similarity.cosine_topk_lsh(emb, queries_df, k=10)


@query(
    "c4_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INTEGER) AS n_distinct_tokens,
           ROUND(LENGTH(REPLACE(text, ' ', '')) / LEN(STRING_SPLIT(text, ' ')), 6)
             AS avg_token_len,
           ROUND(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                 t -> t IN ('the','a','of','and','to','in')))
                 / LEN(STRING_SPLIT(text, ' ')), 6) AS stopword_ratio
    FROM documents
    """,
)
def c4_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: per-document token statistics (token counting tier)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.token_stats(docs)


@query(
    "c4b_quality_score",
    oracle="""
    SELECT doc_id, lang,
           ROUND(CAST(0.4 AS DOUBLE) * CASE WHEN LENGTH(text) BETWEEN 100 AND 5000
                                            THEN 1 ELSE 0 END
               + CAST(0.3 AS DOUBLE) * CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                     t -> t IN ('the','a','of','and','to','in'))) > 0 THEN 1 ELSE 0 END
               + CAST(0.3 AS DOUBLE) * (LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))
                                        / LEN(STRING_SPLIT(text, ' '))), 6) AS quality
    FROM documents
    """,
)
def c4b_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: deterministic document quality score (length band + stopword
    presence + lexical diversity)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_score(docs)


@query(
    "c4c_lang_id",
    oracle="""
    SELECT doc_id, lang AS actual_lang,
           CASE WHEN LIST_CONTAINS(STRING_SPLIT(text, ' '), 'the') THEN 'en'
                WHEN LIST_CONTAINS(STRING_SPLIT(text, ' '), 'data') THEN 'es'
                WHEN LIST_CONTAINS(STRING_SPLIT(text, ' '), 'table') THEN 'fr'
                WHEN LIST_CONTAINS(STRING_SPLIT(text, ' '), 'row') THEN 'de'
                WHEN LIST_CONTAINS(STRING_SPLIT(text, ' '), 'batch') THEN 'zh'
                ELSE 'unknown' END AS predicted_lang
    FROM documents
    """,
)
def c4c_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: marker-token language-ID heuristic (deterministic CASE cascade
    standing in for a char-n-gram classifier)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.lang_id(docs)


@query(
    "c4d_fingerprint",
    oracle="SELECT doc_id, source, MD5(LOWER(TRIM(text))) AS fp FROM documents",
)
def c4d_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: md5 document fingerprinting (exact-dup detection key)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.fingerprint(docs)


@query(
    "c4e_tfidf_top_terms",
    oracle="""
    WITH term_rows AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term,
             LEN(STRING_SPLIT(text, ' ')) AS doc_len
      FROM documents
    ),
    tf AS (SELECT doc_id, term, doc_len, COUNT(*) AS term_cnt
           FROM term_rows GROUP BY 1, 2, 3),
    dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND((term_cnt / doc_len)
                   * LN(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfc ON tf.term = dfc.term
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, tfidf, rn FROM ranked WHERE rn <= 3
    """,
)
def c4e_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: tf-idf top-3 terms per document."""
    docs = load_table(spark, sf_dir, "documents")
    return text.tf_idf_top_terms(docs, k=3)


@query(
    "c5_array_ops",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(SQRT(LIST_DOT_PRODUCT(embedding::DOUBLE[],
                                                     embedding::DOUBLE[]))
                              AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_l2_norm,
           ROUND(CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_first_dim
    FROM embeddings
    GROUP BY label
    """,
)
def c5_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: multimodal/array columns — higher-order functions over
    ArrayType(Float) (norms, element access), aggregated per label."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(F.zip_with(vec, vec, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    )
    first_dim = F.element_at("embedding", 1).cast("double")
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(norm.cast("decimal(18,6)")).cast("double") / F.count("*"), 6
        ).alias("avg_l2_norm"),
        F.round(
            F.sum(first_dim.cast("decimal(18,6)")).cast("double") / F.count("*"), 6
        ).alias("avg_first_dim"),
    )


@query(
    "c6_json_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) > 50
    """,
)
def c6_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: typed JSON property extraction from events.props."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_id", "event_type", k.alias("k_val")).filter(F.col("k_val") > 50)


@query(
    "c4f_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '{text.BPE_PATTERN}')) AS INTEGER)
             AS n_bpe_tokens,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER) AS n_ws_tokens,
           ROUND(LEN(regexp_extract_all(text, '{text.BPE_PATTERN}'))
                 / LEN(STRING_SPLIT(text, ' ')), 6) AS tokens_per_word
    FROM documents
    """,
)
def c4f_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: BPE-ish regex token counting (letter runs / digits /
    punctuation), the tokens-per-word shape a training-data pipeline
    reports; pattern chosen so RE2 (DuckDB) and java.util.regex agree."""
    docs = load_table(spark, sf_dir, "documents")
    return text.bpe_token_stats(docs)


@query(
    "c4g_pii_redaction",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact: doc' || doc_id || '@example.com' AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(text, '{text.EMAIL_PATTERN}', '[REDACTED]', 'g')
             AS redacted_text,
           CAST(LEN(regexp_extract_all(text, '{text.EMAIL_PATTERN}')) AS INTEGER)
             AS n_redactions
    FROM seeded
    """,
)
def c4g_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: PII scrubbing — the corpus has no natural emails, so the query
    plants one per document (deterministically, in both engines) and the
    operator must redact exactly those with an audit count."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact: doc"), F.col("doc_id"), F.lit("@example.com")
        ).alias("text"),
    )
    return text.redact_pii(seeded)


@query(
    "c7_stratified_sample",
    oracle="""
    SELECT lang, doc_id, source FROM (
      SELECT lang, doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) t
    WHERE rn <= 20
    """,
)
def c7_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: deterministic stratified downsampling — cap each language at 20
    documents, picked by md5(id) rank (reproducible on any cluster, no
    seed/partitioning dependence). The corpus-balancing primitive."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.stratified_sample_exact(
        docs, strata_col="lang", k_per_stratum=20, id_col="doc_id"
    ).select("lang", "doc_id", "source")


@query(
    "c8_event_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(first_signup) AS BIGINT) AS reached_signup,
           CAST(COUNT(CASE WHEN first_click > first_signup THEN 1 END) AS BIGINT)
             AS signup_then_click,
           CAST(COUNT(CASE WHEN first_purchase > first_click
                            AND first_click > first_signup THEN 1 END) AS BIGINT)
             AS full_funnel
    FROM per_user
    """,
)
def c8_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: funnel analysis — users progressing signup -> click -> purchase
    in temporal order, computed from one conditional-min aggregation pass
    (no self-joins; the per-user funnel state is 3 timestamps)."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("signup").alias("first_signup"),
        first_ts("click").alias("first_click"),
        first_ts("purchase").alias("first_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("first_signup").alias("reached_signup"),
        F.count(
            F.when(F.col("first_click") > F.col("first_signup"), 1)
        ).alias("signup_then_click"),
        F.count(
            F.when(
                (F.col("first_purchase") > F.col("first_click"))
                & (F.col("first_click") > F.col("first_signup")),
                1,
            )
        ).alias("full_funnel"),
    )


@query(
    "x9_profile_table",
    oracle="""
    WITH w AS (
      SELECT COUNT(*) AS n,
             COUNT(*) - COUNT(l_quantity) AS nu_q, COUNT(DISTINCT l_quantity) AS d_q,
             MIN(l_quantity)::DOUBLE AS mn_q, MAX(l_quantity)::DOUBLE AS mx_q,
             COUNT(*) - COUNT(l_extendedprice) AS nu_e, COUNT(DISTINCT l_extendedprice) AS d_e,
             MIN(l_extendedprice)::DOUBLE AS mn_e, MAX(l_extendedprice)::DOUBLE AS mx_e,
             COUNT(*) - COUNT(l_discount) AS nu_d, COUNT(DISTINCT l_discount) AS d_d,
             MIN(l_discount)::DOUBLE AS mn_d, MAX(l_discount)::DOUBLE AS mx_d
      FROM lineitem
    )
    SELECT 'l_quantity' AS column, n AS n_rows, CAST(nu_q AS BIGINT) AS n_nulls,
           CAST(d_q AS BIGINT) AS n_distinct, mn_q AS min_val, mx_q AS max_val FROM w
    UNION ALL
    SELECT 'l_extendedprice', n, CAST(nu_e AS BIGINT), CAST(d_e AS BIGINT), mn_e, mx_e FROM w
    UNION ALL
    SELECT 'l_discount', n, CAST(nu_d AS BIGINT), CAST(d_d AS BIGINT), mn_d, mx_d FROM w
    """,
)
def x9_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9: one-pass column profiling (nulls/distinct/min/max per column) —
    the pre-publish data-quality summary; single scan, stack-unpivoted."""
    from sheetsetl_spark.operators.profiling import profile_table

    li = load_table(spark, sf_dir, "lineitem")
    return profile_table(li, ["l_quantity", "l_extendedprice", "l_discount"]).select(
        "column",
        "n_rows",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_val",
        "max_val",
    )


@query(
    "c10_intra_doc_repetition",
    oracle="""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id, ARRAY_TO_STRING(w[i:i+2], ' ') AS s
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    per AS (SELECT doc_id, COUNT(*) AS total_shingles,
                   COUNT(DISTINCT s) AS distinct_shingles
            FROM sh GROUP BY doc_id)
    SELECT doc_id, CAST(total_shingles AS BIGINT) AS total_shingles,
           CAST(distinct_shingles AS BIGINT) AS distinct_shingles,
           ROUND(1.0 - 1.0 * distinct_shingles / total_shingles, 6) AS repetition
    FROM per
    ORDER BY repetition DESC, doc_id
    LIMIT 20
    """,
)
def c10_intra_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: intra-document repetition — fraction of duplicated word-3-gram
    shingles (the boilerplate/looping-text quality signal); top-20 most
    repetitive documents. One explode + one groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize once into a column — split() inside the slice lambda would
    # re-split the doc per shingle position (see operators/dedup.shingles)
    toks = docs.select("doc_id", F.split("text", " ").alias("__w"))
    shingle_list = F.expr(
        "CASE WHEN size(__w) >= 3 THEN "
        "transform(sequence(1, size(__w) - 2), "
        "  i -> array_join(slice(__w, i, 3), ' ')) "
        "ELSE array() END"
    )
    sh = toks.select("doc_id", F.explode(shingle_list).alias("s"))
    per = sh.groupBy("doc_id").agg(
        F.count("*").alias("total_shingles"),
        F.countDistinct("s").alias("distinct_shingles"),
    )
    rep = F.round(
        1.0 - F.col("distinct_shingles") / F.col("total_shingles"), 6
    ).alias("repetition")
    return (
        per.select("doc_id", "total_shingles", "distinct_shingles", rep)
        .orderBy(F.col("repetition").desc(), "doc_id")
        .limit(20)
    )


@query(
    "c11_cross_source_contamination",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, source, MD5(LOWER(TRIM(text))) AS fp FROM documents
      UNION ALL
      SELECT doc_id + 1000000, 'src_planted', MD5(LOWER(TRIM(text)))
      FROM documents WHERE doc_id < 10
    )
    SELECT a.doc_id AS doc_a, a.source AS source_a,
           b.doc_id AS doc_b, b.source AS source_b
    FROM corpus a JOIN corpus b
      ON a.fp = b.fp AND a.doc_id < b.doc_id AND a.source <> b.source
    """,
)
def c11_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: cross-source (train/test-split) contamination — documents whose
    normalized fingerprint appears under a different source. The fixture
    has no natural cross-source dups, so the query plants copies of
    doc_id < 10 under 'src_planted' (identically in the oracle); the
    fingerprint equi-self-join must recover exactly those pairs."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    base = docs.select("doc_id", "source", fp)
    planted = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit("src_planted").alias("source"),
        fp,
    )
    corpus = base.unionAll(planted)
    a = corpus.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a"), "fp"
    )
    b = corpus.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"), "fp"
    )
    return (
        a.join(b, "fp")
        .filter((F.col("doc_a") < F.col("doc_b")) & (F.col("source_a") != F.col("source_b")))
        .select("doc_a", "source_a", "doc_b", "source_b")
    )


@query(
    "c12_chunk_documents",
    oracle="""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    chunks AS (
      SELECT doc_id,
             CAST((s - 1) / 48 AS INTEGER) AS chunk_idx,
             w[s:s+63] AS chunk
      FROM toks, LATERAL (
        SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(w), 1), 48)) AS s) u
    )
    SELECT doc_id, chunk_idx,
           ARRAY_TO_STRING(chunk, ' ') AS chunk_text,
           CAST(LEN(chunk) AS INTEGER) AS n_tokens
    FROM chunks WHERE LEN(chunk) > 0
    """,
)
def c12_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12: pre-training document chunking — 64-token windows advancing by
    48 (16-token overlap), trailing partial chunks kept. Array-function
    pipeline (sequence/slice/posexplode), zero Python in the hot path."""
    docs = load_table(spark, sf_dir, "documents")
    return text.chunk_documents(docs, chunk_tokens=64, stride=48)


@query(
    "c13_pack_sequences",
    oracle="""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    chunks AS (
      SELECT doc_id,
             CAST((s - 1) / 48 AS INTEGER) AS chunk_idx,
             CAST(LEN(w[s:s+63]) AS INTEGER) AS n_tokens
      FROM toks, LATERAL (
        SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(w), 1), 48)) AS s) u
      WHERE LEN(w[s:s+63]) > 0
    ),
    cum AS (
      SELECT doc_id, chunk_idx, n_tokens,
             CAST(doc_id // 50 AS INTEGER) AS pack_group,
             SUM(n_tokens) OVER (PARTITION BY CAST(doc_id // 50 AS INTEGER)
                                 ORDER BY doc_id, chunk_idx
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM chunks
    )
    SELECT pack_group,
           CAST((cum_tokens - n_tokens) // 1024 AS BIGINT) AS pack_id,
           doc_id, chunk_idx, n_tokens
    FROM cum
    """,
)
def c13_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13: sequence packing — chunks are assigned to fixed-budget (1024
    token) training sequences by a running token count, parallelized by
    pack group (50 docs each) so no global sort exists. The streaming
    first-fit approximation every packing pipeline uses; at 100 TB each
    group packs independently in its own partition."""
    from pyspark.sql import Window

    from sheetsetl_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=64, stride=48)
    grp = F.expr("doc_id DIV 50").cast("int").alias("pack_group")
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = chunks.select(grp, "doc_id", "chunk_idx", "n_tokens").withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    )
    pack_id = F.expr("(cum_tokens - n_tokens) DIV 1024").cast("bigint")
    return cum.select(
        "pack_group", pack_id.alias("pack_id"), "doc_id", "chunk_idx", "n_tokens"
    )


@query(
    "x10_mix_weights",
    oracle="""
    WITH per AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_sources FROM per)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           ROUND(1.0 * n / total, 6) AS actual_frac,
           ROUND((1.0 / n_sources) / (1.0 * n / total), 6) AS sampling_weight
    FROM per, tot
    """,
)
def x10_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10: domain-mix reweighting — per-source sampling weights that
    rebalance the corpus to a uniform target mix (weight =
    target_frac / actual_frac); feed these to c7's stratified sampler.
    One aggregation + a broadcast of the 1-row total."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count("*").alias("n"))
    tot = per.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_sources")
    )
    joined = per.crossJoin(F.broadcast(tot))
    actual = F.col("n") / F.col("total")
    return joined.select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(actual, 6).alias("actual_frac"),
        F.round((1.0 / F.col("n_sources")) / actual, 6).alias("sampling_weight"),
    )


@query(
    "c14_cdc_apply",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name,
           CASE WHEN l.user_id IS NOT NULL THEN ROUND(l.value, 6)
                ELSE ROUND(c.c_acctbal, 6) END AS acct_value
    FROM customer c
    LEFT JOIN latest l ON c.c_custkey = l.user_id
    WHERE l.user_id IS NULL OR l.event_type <> 'error'
    """,
)
def c14_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14: CDC apply — the events stream acts as a change log on the
    customer snapshot keyed by user_id: the user's latest event updates
    acct_value ('error' = delete). One window over changes + one outer
    join (the MERGE INTO primitive as a composition)."""
    from sheetsetl_spark.operators.incremental import apply_changes

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), "c_name", F.round("c_acctbal", 6).alias("acct_value")
    )
    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        F.col("user_id").alias("c_custkey"),
        F.col("ts"),
        F.col("event_id"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.lit(None).cast("string").alias("c_name"),  # upserts keep snapshot name
        F.round("value", 6).alias("acct_value"),
    )
    applied = apply_changes(
        cust,
        changes,
        keys=["c_custkey"],
        order_cols=[F.col("ts"), F.col("event_id")],
    )
    # change rows carry no c_name; restore it from the snapshot for output
    names = load_table(spark, sf_dir, "customer").select("c_custkey", F.col("c_name").alias("__n"))
    return (
        applied.join(names, "c_custkey")
        .select("c_custkey", F.col("__n").alias("c_name"), "acct_value")
    )


@query(
    "x11_quality_checks",
    oracle="""
    SELECT 'unique(event_id)' AS check,
           CASE WHEN COALESCE(SUM(n - 1), 0) = 0
                THEN 'pass' ELSE 'fail' END AS status,
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
    FROM (SELECT COUNT(*) AS n FROM events GROUP BY event_id) uq
    UNION ALL
    SELECT 'non_null(o_custkey)',
           CASE WHEN COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) = 0
                THEN 'pass' ELSE 'fail' END,
           CAST(COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'in_range(l_discount,[0.0,0.1])',
           CASE WHEN COUNT(CASE WHEN l_discount IS NULL OR l_discount < 0.0
                                     OR l_discount > 0.1 THEN 1 END) = 0
                THEN 'pass' ELSE 'fail' END,
           CAST(COUNT(CASE WHEN l_discount IS NULL OR l_discount < 0.0
                                OR l_discount > 0.1 THEN 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'ref(o_custkey->c_custkey)',
           CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'fail' END,
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def x11_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: declarative data-quality report — uniqueness, non-null, value
    range, and referential integrity, one aggregate scan per check."""
    from sheetsetl_spark.operators import quality

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    return quality.run_checks(
        [
            quality.check_unique(ev, ["event_id"]),
            quality.check_non_null(orders, "o_custkey"),
            quality.check_in_range(li, "l_discount", 0.0, 0.1),
            quality.check_referential(orders, "o_custkey", cust, "c_custkey"),
        ]
    )


@query(
    "c15_scd2_history",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_type, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR event_type IS DISTINCT FROM LAG(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    ivals AS (
      SELECT user_id, event_type, island,
             MIN(ts) AS vf, COUNT(*) AS n_rows
      FROM islands GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type,
           STRFTIME(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           COALESCE(STRFTIME(LEAD(vf) OVER w2, '%Y-%m-%d %H:%M:%S.%f'), '') AS valid_to,
           CASE WHEN LEAD(vf) OVER w2 IS NULL THEN 1 ELSE 0 END AS is_current,
           n_rows
    FROM ivals
    WINDOW w2 AS (PARTITION BY user_id ORDER BY vf, island)
    """,
)
def c15_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15: SCD Type-2 history build — each user's event_type stream becomes
    validity intervals [valid_from, valid_to) with consecutive identical
    values collapsed (gaps-and-islands); the open interval is flagged
    is_current. See operators/incremental.py::scd2_intervals — one shuffle
    by key regardless of history depth. The reference's cron refresh
    (/root/reference/loader.py:168-174) overwrites history; this keeps it."""
    from sheetsetl_spark.operators.incremental import scd2_intervals

    ev = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ivals = scd2_intervals(
        ev, keys=["user_id"], attr_cols=["event_type"],
        ts_col="ts", tiebreak_cols=["event_id"],
    )
    return ivals.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.coalesce(F.date_format("valid_to", fmt), F.lit("")).alias("valid_to"),
        "is_current",
        "n_rows",
    )


@query(
    "c16_shard_assignment",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, MD5(CONCAT('42', ':', CAST(doc_id AS VARCHAR))) AS k
      FROM documents
    ), sharded AS (
      SELECT doc_id, k, ('0x' || SUBSTRING(k, 1, 8))::BIGINT % 8 AS shard_id
      FROM keyed
    )
    SELECT doc_id, shard_id,
           ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY k, doc_id) AS pos
    FROM sharded
    """,
)
def c16_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16: deterministic shuffle-and-shard — every document gets a
    reproducible (shard_id, pos) from md5(seed:id), independent of cluster
    partitioning or input order; the last-mile step that turns a curated
    corpus into stable training shards. See
    operators/layout.py::deterministic_shards."""
    from sheetsetl_spark.operators.layout import deterministic_shards

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_shards(docs, "doc_id", n_shards=8, seed=42).select(
        "doc_id", "shard_id", "pos"
    )


@query(
    "c17_label_centroids",
    oracle="""
    SELECT label, dim,
           ROUND(CAST(SUM(CAST(v AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS centroid,
           COUNT(*) AS n_vectors
    FROM (SELECT label, UNNEST(embedding::DOUBLE[]) AS v,
                 GENERATE_SUBSCRIPTS(embedding, 1) AS dim
          FROM embeddings) t
    GROUP BY 1, 2
    """,
)
def c17_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17: per-class mean embedding (vector aggregate) — posexplode +
    one hash agg on (label, dim), exact-decimal cross-row sums. The IVF
    coarse-quantizer training step and the class-prototype primitive.
    See operators/similarity.py::group_centroids."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.group_centroids(emb, group_col="label", vec_col="embedding")


@query(
    "c18_benchmark_decontamination",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 20
      UNION ALL
      SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 5
    ),
    ev_toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w
                FROM documents WHERE doc_id < 20),
    ev AS (
      SELECT DISTINCT doc_id AS eval_id, ARRAY_TO_STRING(w[i:i+4], ' ') AS shingle
      FROM ev_toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 4)) AS i) u
    ),
    tr_toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM corpus),
    tr AS (
      SELECT DISTINCT doc_id AS train_doc_id, ARRAY_TO_STRING(w[i:i+4], ' ') AS shingle
      FROM tr_toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 4)) AS i) u
    )
    SELECT train_doc_id,
           COUNT(DISTINCT eval_id) AS n_eval_docs,
           COUNT(*) AS n_shared_shingles
    FROM tr JOIN ev USING (shingle)
    GROUP BY 1
    """,
)
def c18_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18: benchmark decontamination — training docs sharing any word
    5-gram with the eval set (doc_id < 20 plays the benchmark). The
    fixture has no natural eval/train 5-gram overlap at this n, so the
    query plants copies of 5 eval texts under train ids (identically in
    the oracle); the broadcast shingle join must recover exactly those.
    See operators/dedup.py::eval_decontamination (eval side broadcast —
    the corpus side never shuffles)."""
    docs = load_table(spark, sf_dir, "documents")
    evals = docs.filter(F.col("doc_id") < 20)
    train = docs.filter(F.col("doc_id") >= 20).select("doc_id", "text").unionAll(
        evals.filter(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 2000000).alias("doc_id"), "text"
        )
    )
    return dedup.eval_decontamination(train, evals, n=5)


@query(
    "c19_apply_mix_weights",
    oracle="""
    WITH per AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_sources FROM per),
    w AS (SELECT source, (1.0 / n_sources) / (1.0 * n / total) AS weight
          FROM per, tot),
    u AS (SELECT doc_id, source,
                 ('0x' || SUBSTRING(MD5(CONCAT('mix', ':', CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
                   / 4294967296.0 AS u
          FROM documents),
    k AS (SELECT doc_id, source,
                 CAST(FLOOR(weight) AS BIGINT)
                   + CASE WHEN u < weight - FLOOR(weight) THEN 1 ELSE 0 END AS n_copies
          FROM u JOIN w USING (source))
    SELECT doc_id, source, copy_id
    FROM k, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, n_copies)) AS copy_id) g
    WHERE n_copies >= 1
    """,
)
def c19_apply_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C19: materialize the target corpus mix — x10's per-source weights
    applied as deterministic weighted resampling (floor(w) copies + one
    more when the md5-uniform of the id falls under frac(w); w<1
    downsamples, w>1 oversamples with copy_id on repeats). Broadcast
    weight table, zero corpus shuffle. See
    operators/dedup.py::weighted_resample."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count("*").alias("n"))
    tot = per.agg(F.sum("n").alias("total"), F.count("*").alias("n_sources"))
    weights = (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            ((F.lit(1.0) / F.col("n_sources")) / (F.lit(1.0) * F.col("n") / F.col("total"))).alias(
                "weight"
            ),
        )
    )
    return dedup.weighted_resample(
        docs.select("doc_id", "source"), weights, join_col="source"
    ).select("doc_id", "source", "copy_id")


@query(
    "c20_quality_threshold_filter",
    oracle="""
    WITH q AS (
      SELECT doc_id,
             ROUND(CAST(0.4 AS DOUBLE) * CASE WHEN LENGTH(text) BETWEEN 100 AND 5000
                                              THEN 1 ELSE 0 END
                 + CAST(0.3 AS DOUBLE) * CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                       t -> t IN ('the','a','of','and','to','in'))) > 0 THEN 1 ELSE 0 END
                 + CAST(0.3 AS DOUBLE) * (LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))
                                          / LEN(STRING_SPLIT(text, ' '))), 6) AS quality
      FROM documents
    ),
    med AS (SELECT ROUND(QUANTILE_CONT(quality, 0.5), 6) AS p50 FROM q)
    SELECT doc_id, quality, p50 FROM q, med WHERE quality >= p50
    """,
)
def c20_quality_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C20: corpus-relative quality filtering — keep documents scoring at
    or above the exact corpus median quality. Two jobs: one percentile
    aggregate (the only full pass), then a broadcast of the 1-row
    threshold against the scored corpus — the data-driven-cutoff shape
    every curation pipeline ends with (vs c4b's absolute scores)."""
    docs = load_table(spark, sf_dir, "documents")
    q = text.quality_score(docs).select("doc_id", "quality")
    med = q.agg(F.round(F.percentile("quality", F.lit(0.5)), 6).alias("p50"))
    return (
        q.crossJoin(F.broadcast(med))
        .filter(F.col("quality") >= F.col("p50"))
        .select("doc_id", "quality", "p50")
    )


@query(
    "x12_ewma_decay",
    oracle="""
    WITH r AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id, n AS n_events,
           ROUND(CAST(SUM(CAST(value * POWER(0.9, n - rn) AS DECIMAL(30,15)))
                      AS DOUBLE), 6) AS ewma_value
    FROM r GROUP BY user_id, n
    """,
)
def x12_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: exponentially-decayed per-user activity (decay 0.9 per event,
    newest weighted highest) — the recency-feature shape. Each term
    value*0.9^age is computed in double (bit-identical across engines),
    then cast to exact DECIMAL before the cross-row sum, so the aggregate
    is associative and independent of partitioning — one keyed window +
    one hash agg, one shuffle total."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    r = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    term = (F.col("value") * F.pow(F.lit(0.9), F.col("n") - F.col("rn"))).cast(
        "decimal(30,15)"
    )
    return r.groupBy("user_id", F.col("n").alias("n_events")).agg(
        F.round(F.sum(term).cast("double"), 6).alias("ewma_value")
    )


@query(
    "c21_novelty_score",
    oracle="""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+2], ' ') AS shingle
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN sh.doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           ROUND(SUM(CASE WHEN sh.doc_id = first_doc THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS novelty
    FROM sh JOIN first USING (shingle)
    GROUP BY sh.doc_id
    """,
)
def c21_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C21: per-document n-gram novelty — the fraction of a doc's distinct
    3-gram shingles whose first occurrence (min doc_id order) is this doc.
    Low novelty = the doc restates earlier corpus content; the
    redundancy/diversity signal used to prioritize what enters a training
    mix. One shingle groupBy (first-occurrence attribution) + one
    shuffle-join back — both keyed on the shingle, no pairwise stage at
    all, so it scales linearly where Jaccard-style dedup is
    candidate-bound."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingles(docs, n=3)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("int")).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
        )
    )


def _semantic_dedup_oracle(
    threshold: float = 0.95, num_centroids: int = 16, dim: int = 64
) -> str:
    """DuckDB twin of ``dedup.semantic_dedup`` over the planted corpus:
    identical centroid assignment (rank-1 cosine, cent_id tiebreak) and
    identical smaller-id-wins pairwise pruning, so the full cluster-then-
    dedup pipeline is hash-checked, not just rows-only."""
    pert = ", ".join(repr(v) for v in _neardup_pert(dim))
    return f"""
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(generate_series(1, {dim}),
                            i -> (embedding::DOUBLE[])[i] + ([{pert}]::DOUBLE[])[i])
      FROM embeddings WHERE vec_id < 20
    ),
    cent AS (SELECT vec_id AS cent_id, v AS cv FROM corpus WHERE vec_id < {num_centroids}),
    asg AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT corpus.vec_id, corpus.v, cent.cent_id,
               ROW_NUMBER() OVER (PARTITION BY corpus.vec_id ORDER BY
                 LIST_DOT_PRODUCT(v, cv)
                   / (SQRT(LIST_DOT_PRODUCT(v, v)) * SQRT(LIST_DOT_PRODUCT(cv, cv))) DESC,
                 cent.cent_id) AS rn
        FROM corpus, cent) t
      WHERE rn = 1
    ),
    dups AS (
      SELECT DISTINCT b.vec_id AS dup_id
      FROM asg a JOIN asg b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      WHERE LIST_DOT_PRODUCT(a.v, b.v)
              / (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v)))
            >= {threshold}
    )
    SELECT vec_id, cent_id FROM asg
    WHERE vec_id NOT IN (SELECT dup_id FROM dups)
    """


@query("c2g_semantic_dedup", oracle=_semantic_dedup_oracle())
def c2g_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 semantic tier: SemDeDup-shaped cluster-then-dedup — coarse
    centroid assignment (broadcast, no shuffle), within-cluster pairwise
    cosine, smaller id survives. Planted perturbed copies of vec_id < 20
    (ids +1e6, sim ~ 0.997) must be the rows removed. See
    operators/dedup.py::semantic_dedup."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    pert_lit = lit_double_array(_neardup_pert())
    planted = base.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.zip_with("embedding", pert_lit, lambda a, b: a + b).alias("embedding"),
    )
    corpus = base.unionAll(planted)
    return dedup.semantic_dedup(corpus, num_centroids=16, threshold=0.95)


@query(
    "c3d_topk_cosine_quantized",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
      SELECT vec_id,
             127.0 / GREATEST(list_max(list_transform(v, x -> ABS(x))), 1e-12) AS sc,
             v
      FROM e
    ),
    q8 AS (
      SELECT vec_id, list_transform(v, x -> FLOOR(x * sc + 0.5)) AS qv FROM s
    ),
    n AS (SELECT vec_id, qv, SQRT(LIST_DOT_PRODUCT(qv, qv)) AS qn FROM q8),
    q AS (SELECT vec_id AS query_id, qv AS aqv, qn AS aqn FROM n WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, n.vec_id AS neighbor_id,
             LIST_DOT_PRODUCT(aqv, n.qv) / (aqn * n.qn) AS sim
      FROM n, q WHERE q.query_id <> n.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS nn_rank
      FROM scored
    )
    SELECT query_id, neighbor_id, nn_rank, ROUND(sim, 6) AS sim
    FROM ranked WHERE nn_rank <= 10
    """,
)
def c3d_topk_cosine_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 memory-scale path: exact top-10 cosine over int8-quantized
    vectors (4x less scan bandwidth; integer dots are exact, so the whole
    approximate pipeline is hash-checked against the DuckDB twin). See
    operators/similarity.py::cosine_topk_quantized."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    return similarity.cosine_topk_quantized(emb, queries_df, k=10)


#: Deterministic planted-URL augmentation shared by c4h's Spark plan and
#: its DuckDB twin (the fixture text has no URLs of its own): every third
#: doc gets a source-derived domain, every ninth a mirror domain too.
_URL_AUG_SQL = """
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' https://' || source || '-' || (doc_id % 7)
                          || '.example.com/p/' || doc_id
                     ELSE '' END
             || CASE WHEN doc_id % 9 = 0
                     THEN ' http://m' || (doc_id % 4) || '.mirror.example.org/x'
                     ELSE '' END AS text
      FROM documents
"""


def _with_planted_urls(docs: DataFrame) -> DataFrame:
    url1 = F.concat(
        F.lit(" https://"), F.col("source"), F.lit("-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
    )
    url2 = F.concat(
        F.lit(" http://m"), (F.col("doc_id") % 4).cast("string"),
        F.lit(".mirror.example.org/x"),
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, url1).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 9 == 0, url2).otherwise(F.lit("")),
        ).alias("text"),
    )


@query(
    "c4h_url_domain_stats",
    oracle=f"""
    WITH aug AS ({_URL_AUG_SQL}),
    urls AS (
      SELECT doc_id, UNNEST(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
      FROM aug
    )
    SELECT domain, COUNT(*) AS n_urls, COUNT(DISTINCT doc_id) AS n_docs
    FROM urls GROUP BY 1
    """,
)
def c4h_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: URL extraction + per-domain corpus stats — the first step of
    domain-level curation (blocklists, per-domain quality priors, crawl
    dedup). URLs are planted deterministically (fixture text has none);
    extraction is one JVM-side regexp pass, aggregation is domain-sized.
    See operators/text.py::url_domain_stats."""
    docs = load_table(spark, sf_dir, "documents")
    return text.url_domain_stats(_with_planted_urls(docs))


@query(
    "c4i_heavy_hitters",
    oracle="""
    WITH toks AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents),
    counts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1),
    total AS (SELECT SUM(cnt) AS t FROM counts)
    SELECT token, cnt, ROUND(cnt / t, 6) AS frac
    FROM counts, total WHERE cnt >= t * 0.02
    """,
)
def c4i_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: corpus-wide heavy-hitter tokens (freq >= 2% of all tokens) —
    the exact formulation of the frequency analysis that feeds stopword
    lists and dedup df-caps. Single corpus scan: the one-row total is
    re-aggregated from the vocabulary-sized count table, so ReuseExchange
    shares the scan+partial-agg subtree. See
    operators/text.py::heavy_hitters."""
    docs = load_table(spark, sf_dir, "documents")
    return text.heavy_hitters(docs, min_frac=0.02)


def _zorder_oracle(bits: int = 16) -> str:
    """DuckDB twin of layout.zorder_value: the identical bit-interleave
    expression, generated from the same loop."""
    terms = []
    for i in range(bits):
        terms.append(f"(((o_custkey >> {i}) & 1) << {2 * i})")
        terms.append(f"(((o_orderkey >> {i}) & 1) << {2 * i + 1})")
    z = " + ".join(terms)
    return f"""
    WITH z AS (SELECT o_orderkey, o_custkey, {z} AS zval FROM orders)
    SELECT o_orderkey, zval,
           NTILE(8) OVER (ORDER BY zval, o_orderkey) AS file_bucket
    FROM z
    """


@query("x13_zorder_curve", oracle=_zorder_oracle())
def x13_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13: Morton z-values over (o_custkey, o_orderkey) + the 8-way file
    bucket each row lands in — the clustering key behind multi-column
    data skipping (operators/layout.py::zorder_by writes this layout;
    tests/test_scale_layout.py proves the per-file min/max stats tighten).
    The NTILE here is the deterministic stand-in for the production
    range-partitioner, whose sampled boundaries aren't oracle-stable."""
    from pyspark.sql import Window

    from sheetsetl_spark.operators.layout import zorder_value

    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("zval", "o_orderkey")
    return (
        o.select("o_orderkey", zorder_value("o_custkey", "o_orderkey").alias("zval"))
        .withColumn("file_bucket", F.ntile(8).over(w))
    )


def _kmeans_oracle(k: int = 8) -> str:
    """DuckDB twin of ``similarity.kmeans_refine`` (2 Lloyd rounds):
    identical squared-distance argmin (cent_id tiebreak), identical
    exact-decimal means, identical dim-ordered array rebuild — the full
    iterative pipeline is hash-checked, not a single step."""
    assign = """
      SELECT vec_id, v, cent_id FROM (
        SELECT e.vec_id, e.v, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 e.vv - 2 * LIST_DOT_PRODUCT(e.v, c.cv) + LIST_DOT_PRODUCT(c.cv, c.cv) ASC,
                 c.cent_id) AS rn
        FROM e, {cent} c) t
      WHERE rn = 1
    """
    means = """
      SELECT cent_id, dim,
             CAST(SUM(CAST(val AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS centroid,
             COUNT(*) AS n_vectors
      FROM (SELECT cent_id, UNNEST(v) AS val, GENERATE_SUBSCRIPTS(v, 1) AS dim
            FROM {asg}) t
      GROUP BY 1, 2
    """
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      LIST_DOT_PRODUCT(embedding::DOUBLE[], embedding::DOUBLE[]) AS vv
               FROM embeddings),
    c0 AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {k}),
    a1 AS ({assign.format(cent="c0")}),
    m1 AS ({means.format(asg="a1")}),
    c1 AS (SELECT cent_id, LIST(centroid ORDER BY dim) AS cv FROM m1 GROUP BY 1),
    a2 AS ({assign.format(cent="c1")}),
    m2 AS ({means.format(asg="a2")})
    SELECT cent_id, dim, ROUND(centroid, 6) AS centroid, n_vectors FROM m2
    """


@query("c22_kmeans_refine", oracle=_kmeans_oracle())
def c22_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C22: distributed Lloyd's k-means (2 refinement rounds, k=8,
    deterministic init) — the corpus-clustering step behind semantic
    dedup and IVF index training. Per round: broadcast(k) assignment scan
    (no shuffle) + one (cent_id, dim) agg of k x dim cells. See
    operators/similarity.py::kmeans_refine."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kmeans_refine(emb, k=8, iters=2)


def _pagerank_oracle(iters: int = 3, damping: float = 0.85) -> str:
    """DuckDB twin of ``graph.pagerank`` over the nation trade graph:
    identical edge derivation, identical src-ordered contribution fold
    (list_reduce over LIST(.. ORDER BY src)), float literals injected via
    repr() so both engines parse the exact same doubles."""
    d = f"CAST('{damping!r}' AS DOUBLE)"
    one_minus_d = f"CAST('{(1.0 - damping)!r}' AS DOUBLE)"
    parts = [
        f"""
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    c{i} AS (
      SELECT e.dst AS node,
             list_reduce(LIST(r.rank * (e.w / ow.ow) ORDER BY e.src),
                         (a, b) -> a + b) AS s
      FROM edges e
      JOIN r{i - 1} r ON e.src = r.node
      JOIN outw ow ON e.src = ow.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.node, {one_minus_d} / nn.n + {d} * COALESCE(c.s, 0.0) AS rank
      FROM nodes n CROSS JOIN nn LEFT JOIN c{i} c ON n.node = c.node
    )"""
        )
    parts.append(f"\n    SELECT node, ROUND(rank, 10) AS rank FROM r{iters}")
    return "".join(parts)


@query("x22_pagerank_trade", oracle=_pagerank_oracle())
def x22_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X22: weighted PageRank (3 fixed rounds, d=0.85) over the nation
    trade graph (customer-nation -> supplier-nation edges weighted by
    line items). The deterministic src-ordered fold makes the full
    iterative pipeline hash-checkable. See operators/graph.py::pagerank."""
    from sheetsetl_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    return pagerank(edges, iters=3, damping=0.85)


@query(
    "c23_incremental_agg_merge",
    # The oracle is the FULL recompute — the whole point: merging the
    # history partial with the delta partial must equal aggregating all
    # of history from scratch, bit-for-bit (decimal partials are
    # associative).
    oracle="""
    SELECT user_id, event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id, event_type
    """,
)
def c23_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C23: materialized-aggregate maintenance — history (ts < Jan 16) is
    aggregated once, the delta (ts >= Jan 16) separately, and
    merge_aggregates combines the partials. At 100 TB the history
    aggregate is a stored table and each refresh costs O(delta + groups)
    instead of a full rescan; the oracle proves the merge is EXACTLY the
    full recompute. See operators/incremental.py::merge_aggregates."""
    from sheetsetl_spark.operators.incremental import merge_aggregates

    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")

    def agg(part: DataFrame) -> DataFrame:
        return part.groupBy("user_id", "event_type").agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )

    history = agg(ev.filter(F.col("ts") < split))
    delta = agg(ev.filter(F.col("ts") >= split))
    merged = merge_aggregates(
        history, delta, keys=["user_id", "event_type"],
        count_col="cnt", sum_cols=["total_value"],
    )
    return merged.select(
        "user_id", "event_type", "cnt", F.col("total_value").cast("double").alias("total_value")
    )


def _minhash_portable_oracle(
    threshold: float, num_hashes: int = 16, bands: int = 4, n: int = 3, df_cap: int = 1000
) -> str:
    """DuckDB twin of ``dedup.minhash_lsh_pairs(hash_family='md5')``:
    rebuilds the SIGNATURES and BAND BUCKETS verbatim (60-bit md5-prefix
    hash family, ':'-joined band values), so the approximate candidate
    stage itself is hash-checked — c2b's oracle only checks the verified
    output against exact Jaccard; this one checks the banding."""
    rpb = num_hashes // bands
    return f"""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+{n - 1}], ' ') AS shingle
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - {n - 1})) AS i) u
    ),
    sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM sh0) t
      WHERE df <= {df_cap}
    ),
    h AS (
      SELECT doc_id, ('0x' || SUBSTRING(MD5(shingle), 1, 15))::BIGINT AS h FROM sh
    ),
    fam AS (
      SELECT doc_id, i,
             MIN(('0x' || SUBSTRING(MD5(CONCAT(CAST(i AS VARCHAR), ':', CAST(h AS VARCHAR))),
                              1, 15))::BIGINT) AS mh
      FROM h, (SELECT UNNEST(GENERATE_SERIES(0, {num_hashes - 1})) AS i) fs
      GROUP BY 1, 2
    ),
    bandv AS (
      SELECT doc_id, i // {rpb} AS band_idx,
             STRING_AGG(CAST(mh AS VARCHAR), ':' ORDER BY i) AS band_val
      FROM fam GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandv a
      JOIN bandv b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN sh a ON c.doc_a = a.doc_id
      JOIN sh b ON c.doc_b = b.doc_id AND a.shingle = b.shingle
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) >= {threshold}
    """


@query(
    "c2d_minhash_lsh_portable",
    oracle=_minhash_portable_oracle(threshold=_JACCARD_THRESHOLD),
)
def c2d_minhash_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 audit path: MinHash(16)+LSH(4 bands) with the engine-portable
    md5-prefix hash family — signatures AND band buckets are rebuilt
    verbatim in the DuckDB twin, so the approximate stage itself is
    hash-checked (c2b's xxhash64 fast path stays the production
    default). See operators/dedup.py::minhash_lsh_pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs,
        threshold=_JACCARD_THRESHOLD,
        num_hashes=16,
        bands=4,
        n=3,
        max_shingle_df=_SHINGLE_DF_CAP,
        max_bucket_size=None,
        hash_family="md5",
    )


@query(
    "c24_fuzzy_name_match",
    oracle="""
    WITH names AS (SELECT DISTINCT LOWER(TRIM(p_name)) AS name FROM part),
    b AS (SELECT name, STRING_SPLIT(name, ' ')[-1] AS block FROM names)
    SELECT a.name AS name_a, c.name AS name_b,
           LEVENSHTEIN(a.name, c.name) AS distance
    FROM b a JOIN b c ON a.block = c.block AND a.name < c.name
    WHERE LEVENSHTEIN(a.name, c.name) <= 4
    """,
)
def c24_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C24: entity-resolution fuzzy match over part names — block on the
    head noun, verify by Levenshtein <= 4, at the distinct-name level so
    the pairwise stage runs on the (tiny) vocabulary and the result
    broadcasts back onto the corpus. See
    operators/dedup.py::fuzzy_name_pairs."""
    p = load_table(spark, sf_dir, "part")
    return dedup.fuzzy_name_pairs(p, text_col="p_name", max_distance=4)


@query(
    "c25_paragraph_dedup",
    oracle="""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    chunks AS (
      SELECT doc_id,
             CAST((s - 1) / 10 AS INTEGER) AS chunk_idx,
             ARRAY_TO_STRING(w[s:s+9], ' ') AS chunk_text
      FROM toks, LATERAL (
        SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(w), 1), 10)) AS s) u
      WHERE LEN(w[s:s+9]) > 0
    ),
    ranked AS (
      SELECT doc_id, chunk_idx, chunk_text,
             ROW_NUMBER() OVER (PARTITION BY chunk_text
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM chunks
    )
    SELECT doc_id,
           STRING_AGG(chunk_text, ' ' ORDER BY chunk_idx) AS clean_text,
           CAST(COUNT(*) AS INTEGER) AS n_kept_chunks
    FROM ranked WHERE rn = 1
    GROUP BY doc_id
    """,
)
def c25_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25: paragraph-level exact dedup (CCNet/Dolma-style) — 10-token
    chunks stand in for paragraphs (the fixture corpus has no newline
    structure); only the globally-first occurrence of each distinct chunk
    survives, documents are reassembled from their surviving chunks. Two
    shuffles at any scale (chunk winner window + doc reassembly); the
    oracle derives winners independently via ROW_NUMBER."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_paragraphs(docs, chunk_tokens=10)


@query(
    "c26_bm25_search",
    oracle="""
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
      FROM term_rows WHERE term IN ('spark', 'shuffle', 'vector')
      GROUP BY doc_id, term
    ),
    dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT tf.doc_id,
             ROUND(LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)),
                   6) AS c,
             tf.term
      FROM tf JOIN dfc ON tf.term = dfc.term, params
    ),
    scored AS (
      SELECT doc_id,
             CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS score,
             CAST(COUNT(DISTINCT term) AS INTEGER) AS n_matched
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score, n_matched FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn FROM scored
    ) WHERE rn <= 10
    """,
)
def c26_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C26: BM25 ranked retrieval for the query bag {spark, shuffle,
    vector} — the lexical half of a retrieval stack (C3 is the dense
    half). Token stream filtered to query terms before any shuffle;
    corpus stats (N, avgdl) are a one-row broadcast; per-term
    contributions rounded then decimal-summed for order-independence."""
    docs = load_table(spark, sf_dir, "documents")
    return text.bm25_scores(docs, ["spark", "shuffle", "vector"], k=10)


@query(
    "x38_salted_join",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def x38_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X38: skew-salted fact join (operators/skew.py) — the probe side
    scatters across 8 salt sub-keys, the build side replicates 8×, the
    hot key's rows land in 8 partitions instead of 1. The salt never
    escapes, so the result is IDENTICAL to the plain equi-join — which is
    exactly what the oracle runs. AQE's skew split covers sort-merge
    joins after stats exist; this is the planned-skew fallback."""
    from sheetsetl_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        salted_join(li, o, ["l_orderkey"], how="inner", salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(rev.cast("decimal(18,6)")).cast("double").alias("revenue"),
        )
    )


_CMS_PROBES = ("table", "value", "row", "scan", "key")


@query(
    "c27_count_min_sketch",
    oracle=f"""
    WITH toks AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents),
    cells AS (
      SELECT i AS depth,
             ('0x' || SUBSTRING(MD5(CONCAT(CAST(i AS VARCHAR), ':', token)), 1, 15))::BIGINT
               % 1024 AS bucket
      FROM toks, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS i) d
    ),
    sketch AS (SELECT depth, bucket, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
    probes(token) AS (VALUES {", ".join(f"('{t}')" for t in _CMS_PROBES)}),
    pb AS (
      SELECT token, i AS depth,
             ('0x' || SUBSTRING(MD5(CONCAT(CAST(i AS VARCHAR), ':', token)), 1, 15))::BIGINT
               % 1024 AS bucket
      FROM probes, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS i) d
    ),
    est AS (
      SELECT token, MIN(cnt) AS cms_est
      FROM pb JOIN sketch USING (depth, bucket) GROUP BY token
    ),
    exact AS (
      SELECT token, COUNT(*) AS exact_cnt FROM toks
      WHERE token IN ({", ".join(f"'{t}'" for t in _CMS_PROBES)})
      GROUP BY token
    )
    SELECT token, exact_cnt, cms_est,
           CAST(cms_est >= exact_cnt AS INT) AS overestimates
    FROM exact JOIN est USING (token)
    """,
)
def c27_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C27: count-min sketch heavy-hitter estimates — the bounded-memory
    successor to exact heavy hitters (c4i) for vocabularies that outgrow
    a shuffle. Portable md5-prefix hashing means the DuckDB twin rebuilds
    the sketch itself, so the approximate structure (not just its
    outputs) is hash-checked. See operators/text.py::count_min_sketch_estimates."""
    docs = load_table(spark, sf_dir, "documents")
    return text.count_min_sketch_estimates(docs, list(_CMS_PROBES))


@query(
    "x39_hll_sketch_rollup",
    oracle="""
    WITH e AS (
      SELECT DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week,
             user_id
      FROM events
    )
    SELECT week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(ABS(APPROX_COUNT_DISTINCT(user_id) - COUNT(DISTINCT user_id))
                <= 0.05 * COUNT(DISTINCT user_id) AS INT) AS merged_within_tol
    FROM e GROUP BY week
    """,
)
def x39_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X39: mergeable HLL sketch rollup (Apache DataSketches via Spark
    3.5's hll_sketch_agg / hll_union_agg) — daily user sketches are built
    once, then UNIONED into weekly distincts without rescanning the raw
    events. This is the incremental form sketches exist for: a 100 TB
    event store keeps per-partition sketch bytes (fixed size) and any
    rollup window is a cheap merge. The estimate is engine-specific, so
    the hash-checked contract mirrors x1: (exact value, merged-estimate-
    within-5% flag), each engine judging its own sketch."""
    ev = load_table(spark, sf_dir, "events")
    week = (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7).cast(
        "long"
    )
    daily = ev.select(
        F.to_date("ts").alias("day"), week.alias("week"), "user_id"
    ).groupBy("day", "week").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = (
        ev.select(week.alias("week"), "user_id")
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return exact.join(merged, "week").select(
        "week",
        "exact_users",
        (F.abs(F.col("est") - F.col("exact_users")) <= 0.05 * F.col("exact_users"))
        .cast("int")
        .alias("merged_within_tol"),
    )


@query(
    "c28_incremental_neardup",
    oracle=f"""
    WITH newb AS (SELECT doc_id, text, lang, n_chars FROM documents WHERE source = 'src0'),
    hist AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
    shn0 AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+2], ' ') AS shingle
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM newb) t,
           LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    shn AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM shn0) t
      WHERE df <= {_SHINGLE_DF_CAP}
    ),
    sho0 AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+2], ' ') AS shingle
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM hist) t,
           LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    sho AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sho0) t
      WHERE df <= {_SHINGLE_DF_CAP}
    ),
    pairs AS (
      SELECT n.doc_id AS new_id, o.doc_id AS old_id, COUNT(*) AS inter
      FROM shn n JOIN sho o USING (shingle) GROUP BY 1, 2
    ),
    szn AS (SELECT doc_id AS new_id, COUNT(*) AS n_new FROM shn GROUP BY 1),
    szo AS (SELECT doc_id AS old_id, COUNT(*) AS n_old FROM sho GROUP BY 1),
    dups AS (
      SELECT DISTINCT new_id FROM pairs
      JOIN szn USING (new_id) JOIN szo USING (old_id)
      WHERE ROUND(inter / (n_new + n_old - inter), 6) >= {_JACCARD_THRESHOLD}
    )
    SELECT doc_id, lang, n_chars FROM newb
    WHERE doc_id NOT IN (SELECT new_id FROM dups)
    """,
)
def c28_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C28: incremental near-dup — the daily-crawl shape: new batch
    (source src0) deduped against the already-ingested history (every
    other source) via the ASYMMETRIC band join; history↔history pairs are
    never generated. Kept = new docs with no cross-side Jaccard >= 0.5
    twin (oracle recomputes the exact cross-side answer; equality holds
    at banding recall 1, same contract as c2b)."""
    docs = load_table(spark, sf_dir, "documents")
    newb = docs.filter(F.col("source") == "src0")
    hist = docs.filter(F.col("source") != "src0")
    kept = dedup.incremental_neardup_filter(
        newb, hist, threshold=_JACCARD_THRESHOLD, max_shingle_df=_SHINGLE_DF_CAP
    )
    return kept.select("doc_id", "lang", "n_chars")


@query(
    "x40_exact_correlation",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price
    FROM m
    """,
)
def x40_exact_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X40: Pearson correlation from EXACT decimal moments — F.corr's
    streaming double accumulation is partitioning-dependent in the last
    ulps, so the deterministic form aggregates the five moments in
    decimal (associative, order-free) and applies the closed formula
    once. Same single-shuffle cost as corr; bit-identical on any
    cluster."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    # Row products stay in double (exactly representable for the fixture
    # scales: integer quantities, 2-decimal prices, all < 2^53 after
    # scaling) and each product is cast to decimal BEFORE the sum — the
    # accumulation, the only order-dependent step, is order-free.
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,6)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(38,6)")).cast("double").alias("sxy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select("l_returnflag", "n", F.round(corr, 6).alias("corr_qty_price"))


@query(
    "x41_table_checksum",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || SUBSTRING(MD5(
                 CONCAT_WS('|', CAST(o_orderkey AS VARCHAR),
                                CAST(o_custkey AS VARCHAR),
                                o_orderstatus,
                                STRFTIME(o_orderdate, '%Y-%m-%d'))), 1, 15))::BIGINT
               AS DECIMAL(38,0))) AS VARCHAR) AS checksum
    FROM orders
    """,
)
def x41_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X41: order-insensitive table checksum — the cross-engine content
    fingerprint a migration or CDC pipeline uses to prove two copies hold
    the same rows without sorting or transferring either side. Summed
    60-bit md5 prefixes in wide decimal; both engines derive the
    identical value from identical content. See
    operators/quality.py::table_checksum."""
    from sheetsetl_spark.operators.quality import table_checksum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
    )
    return table_checksum(o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_date"])


@query(
    "c29_gopher_quality_rules",
    oracle="""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w,
             LEN(REPLACE(text, ' ', '')) AS n_chars_nospace,
             text
      FROM documents
    ),
    per AS (
      SELECT doc_id,
             LEN(w) AS n_words,
             ROUND(1.0 * n_chars_nospace / LEN(w), 6) AS mean_word_len,
             ROUND(1.0 * LEN(LIST_FILTER(w, x -> x IN ('the','a','of','and','to','in'))) / LEN(w), 6) AS stopword_ratio,
             ROUND(1.0 * LEN(LIST_DISTINCT(w)) / LEN(w), 6) AS distinct_ratio
      FROM t
    )
    SELECT doc_id,
           CAST(n_words AS INT) AS n_words,
           mean_word_len, stopword_ratio, distinct_ratio,
           CAST(n_words BETWEEN 30 AND 100000 AS INT) AS word_count_ok,
           CAST(mean_word_len BETWEEN 3.0 AND 12.0 AS INT) AS mean_len_ok,
           CAST(stopword_ratio >= 0.05 AS INT) AS stopword_ok,
           CAST(distinct_ratio >= 0.3 AS INT) AS distinct_ok,
           CAST(n_words BETWEEN 30 AND 100000
                AND mean_word_len BETWEEN 3.0 AND 12.0
                AND stopword_ratio >= 0.05
                AND distinct_ratio >= 0.3 AS INT) AS passes
    FROM per
    """,
)
def c29_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C29: Gopher/Dolma-style heuristic curation rules — per-document
    boolean flags (word count band, mean word length band, stopword
    ratio, distinct-token ratio) plus the aggregate pass verdict. One
    scan, zero shuffles (operators/text.py::gopher_quality_flags)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.gopher_quality_flags(docs)


@query(
    "c30_unigram_logprob",
    oracle="""
    WITH term_rows AS (
      SELECT doc_id, LEN(w) AS doc_len, UNNEST(w) AS term
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents) t
    ),
    tf AS (
      SELECT doc_id, term, doc_len, COUNT(*) AS cnt
      FROM term_rows GROUP BY doc_id, term, doc_len
    ),
    model AS (SELECT term, SUM(cnt) AS g_cnt FROM tf GROUP BY term),
    tot AS (SELECT SUM(g_cnt) AS total FROM model)
    SELECT doc_id,
           CAST(doc_len AS INT) AS n_tokens,
           FLOOR(CAST(SUM(CAST(cnt * (FLOOR(-LN(1.0 * g_cnt / total) * 1000000.0 + 0.5) / 1000000.0) AS DECIMAL(28,6))) AS DOUBLE) / doc_len * 1000000.0 + 0.5) / 1000000.0 AS avg_surprise
    FROM tf JOIN model USING (term), tot
    GROUP BY doc_id, doc_len
    """,
)
def c30_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C30: unigram-LM surprise score — the perplexity-filter stand-in
    (CCNet/KenLM bucket shape): corpus-trained unigram model, per-doc
    mean -ln p(token), decimal-accumulated for order-free hash parity
    (operators/text.py::unigram_logprob)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.unigram_logprob(docs)


@query(
    "c31_train_split",
    oracle="""
    WITH s AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w,
             ('0x' || SUBSTRING(MD5(CONCAT('split', ':', CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM documents
    )
    SELECT CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(w)) AS BIGINT) AS n_tokens
    FROM s GROUP BY 1
    """,
)
def c31_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C31: deterministic hash-based train/val/test split — assignment is
    a pure function of (doc_id, tag) so eval membership is stable across
    clusters and re-runs, unlike partition-dependent randomSplit
    (operators/layout.py::hash_split). Reports per-split doc and token
    counts."""
    from sheetsetl_spark.operators.layout import hash_split
    from sheetsetl_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", train_frac=0.8, val_frac=0.1, tag="split")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens("text"))).alias("n_tokens"),
        )
    )


@query(
    "c32_domain_mix_report",
    oracle="""
    WITH per AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_docs) AS d, SUM(n_tokens) AS t FROM per)
    SELECT source, n_docs, n_tokens,
           ROUND(1.0 * n_docs / d, 6) AS doc_share,
           ROUND(1.0 * n_tokens / t, 6) AS token_share
    FROM per, tot
    """,
)
def c32_domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C32: corpus mix report — per-source docs/tokens and corpus shares,
    the table a data-mixing decision (and c19's weights) starts from.
    Single corpus scan (operators/text.py::domain_mix_report)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.domain_mix_report(docs)


@query(
    "c33_vocab_coverage",
    oracle="""
    WITH term_rows AS (
      SELECT doc_id, LEN(w) AS doc_len, UNNEST(w) AS term
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents) t
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS cnt FROM term_rows GROUP BY term
        ORDER BY cnt DESC, term LIMIT 100) v
    ),
    oov AS (
      SELECT doc_id, COUNT(*) AS n_oov
      FROM term_rows WHERE term NOT IN (SELECT term FROM vocab)
      GROUP BY doc_id
    ),
    base AS (SELECT doc_id, doc_len FROM term_rows GROUP BY doc_id, doc_len)
    SELECT b.doc_id,
           CAST(b.doc_len AS INT) AS n_tokens,
           CAST(COALESCE(o.n_oov, 0) AS INT) AS n_oov,
           ROUND(1.0 * COALESCE(o.n_oov, 0) / b.doc_len, 6) AS oov_ratio
    FROM base b LEFT JOIN oov o ON b.doc_id = o.doc_id
    """,
)
def c33_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C33: tokenizer-vocabulary coverage — top-100 corpus vocabulary via
    distributed top-k, per-document OOV fraction via broadcast membership
    anti-join (operators/text.py::vocab_coverage)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.vocab_coverage(docs, vocab_size=100)


# Shared splitmix-style byte mixer for the synthesized media corpora
# (c50/c51/c52): strong enough that the 56-bit dHash space has ZERO
# natural Hamming-1 collisions even at the 10x fixture (measured: 16000
# docs -> 0 pairs, all hashes unique), expressible identically in
# Python ints, numpy uint64, and DuckDB HUGEINT arithmetic. The inner
# state is reduced mod 2^32 before the final multiply so the DuckDB
# HUGEINT product cannot overflow 2^127.
_MIX_K1 = 11400714819323198485
_MIX_K2 = 13787848793156543929
_MIX_K3 = 10723151780598845931
_M64 = 1 << 64


def _mix(i: int, j: int) -> int:
    h = (i * _MIX_K1 + j * _MIX_K2) % _M64
    x = (h ^ (h >> 31)) % 4294967296
    return ((x * _MIX_K3) % _M64) >> 24


def _mix_sql(base: str, j: str) -> str:
    """The same mixer as a DuckDB scalar expression over HUGEINT."""
    h = f"(({base})::HUGEINT * {_MIX_K1} + ({j})::HUGEINT * {_MIX_K2}) % {_M64}"
    x = f"(xor({h}, ({h}) // 2147483648) % 4294967296)"
    return f"((({x}) * {_MIX_K3}) % {_M64} // 16777216)"


def _image_neardup_oracle(width: int = 8, height: int = 8, max_hamming: int = 1) -> str:
    """DuckDB twin of c50: recomputes every image's dHash closed-form
    from the synthesized pixel arithmetic (same trick as c5b) and
    brute-forces all pairs — legitimate as an oracle because the banded
    Hamming join is EXACT (pigeonhole: bands > max_hamming), so blocked
    and brute-force answers must be identical."""
    n_bytes = width * height * 3
    v = (
        f"(({_mix_sql('base', 'j')})"
        " + CASE WHEN pert = 1 AND j < 3 THEN 16 ELSE 0 END) % 256"
    )
    return f"""
    WITH imgs AS (
      SELECT doc_id AS img_id, doc_id AS base, 0 AS pert FROM documents
      UNION ALL
      SELECT doc_id + 1000000, doc_id, 1 FROM documents WHERE doc_id % 100 < 2
    ),
    px AS (
      SELECT img_id, j // 3 AS pi, {v} AS v
      FROM imgs, (SELECT UNNEST(generate_series(0, {n_bytes - 1})) AS j) js
    ),
    gray AS (SELECT img_id, pi, SUM(v) // 3 AS g FROM px GROUP BY img_id, pi),
    dh AS (
      SELECT a.img_id,
             CAST(SUM(CASE WHEN a.g < b.g THEN
               (1::BIGINT << ((a.pi // {width}) * {width - 1} + (a.pi % {width})))
               ELSE 0 END) AS BIGINT) AS d
      FROM gray a JOIN gray b
        ON b.img_id = a.img_id AND b.pi = a.pi + 1
      WHERE a.pi % {width} < {width - 1}
      GROUP BY a.img_id
    )
    SELECT a.img_id AS img_a, b.img_id AS img_b,
           CAST(bit_count(xor(a.d, b.d)) AS INT) AS hamming
    FROM dh a JOIN dh b ON a.img_id < b.img_id
    WHERE bit_count(xor(a.d, b.d)) <= {max_hamming}
    """


@query("c50_image_neardup", oracle=_image_neardup_oracle())
def c50_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5/C2: image near-duplicate detection over REAL binary payloads —
    dHash (grayscale row-gradient bits) computed by decoding each
    synthesized P6 PPM inside Arrow mapInPandas
    (operators/multimodal.py::image_dhash), then EXACT banded Hamming
    blocking (operators/multimodal.py::image_neardup_pairs): the 64-bit
    hash splits into bands > max_hamming, so by pigeonhole every pair
    within the Hamming budget agrees on a full band — candidates come
    from a (band_idx, band_val) equi-join, never all-pairs, and the
    result is EXACT (hash-checked against a brute-force DuckDB twin that
    recomputes the pixel arithmetic closed-form). Planted near-dups: 2%
    of docs (doc_id % 100 < 2 — linear in the corpus, the scale-step
    property) get a +1e6 copy with the first PIXEL brightened — that
    flips at most dHash bit 0, so every planted pair lands within
    Hamming 1.

    The _mix splitmix-style pixel generator replaced the r7 form
    (i*31 additive), which gave every doc an IDENTICAL row-gradient —
    all dHashes equal, the 'near-dup' truth was all-pairs (~1.1M rows
    at sf0.1), and the banded blocking degenerated to one bucket
    holding the whole corpus (caught by the r8 10x scale step, which
    stalled on that bucket's straggler). With mixed 8x8 images the
    56-bit hash space has ZERO natural Hamming-1 collisions even at
    the 10x fixture, so the output is exactly the planted pairs and
    the blocking path demonstrates its real shape."""
    from sheetsetl_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")

    def pf(i: int, j: int) -> int:
        return _mix(i, j)

    def pf_pert(i: int, j: int) -> int:
        return pf(i, j) + (16 if j < 3 else 0)

    base = mm.synthesize_ppm_media(docs, "doc_id", width=8, height=8, pixel_fn=pf)
    pert = mm.synthesize_ppm_media(
        docs.filter(F.col("doc_id") % 100 < 2),
        "doc_id",
        width=8,
        height=8,
        pixel_fn=pf_pert,
        id_offset=1000000,
    )
    # 8x8 dHash = 8 rows x 7 adjacent-column bits = 56 live bits; band
    # over exactly those so both bands carry full-entropy values (the
    # 64-bit default left 8 dead bits in the high band — harmless here,
    # unlike c52's fully-dead band, but the intent is now explicit)
    pairs = mm.image_neardup_pairs(
        base.unionAll(pert), max_hamming=1, bands=2, hash_bits=56
    )
    return pairs.select(
        "img_a", "img_b", F.col("hamming").cast("int").alias("hamming")
    )


def _video_neardup_oracle(
    width: int = 8, height: int = 8, n_frames: int = 3, min_shared: int = 2
) -> str:
    """DuckDB twin of c51: per-frame dHashes recomputed closed-form from
    the synthesized pixel arithmetic (frame f's byte j mixes as
    _mix(base, f*n_bytes + j)), frame-hash self-join, distinct
    shared-hash count per pair."""
    n_bytes = width * height * 3
    v = (
        f"(({_mix_sql('base', f'f * {n_bytes} + j')})"
        f" + CASE WHEN pert = 1 AND f = {n_frames - 1} THEN 64 ELSE 0 END) % 256"
    )
    return f"""
    WITH vids AS (
      SELECT doc_id AS vid, doc_id AS base, 0 AS pert FROM documents
      UNION ALL
      SELECT doc_id + 1000000, doc_id, 1 FROM documents WHERE doc_id % 100 < 2
    ),
    px AS (
      SELECT vid, f, j // 3 AS pi, {v} AS v
      FROM vids,
           (SELECT UNNEST(generate_series(0, {n_frames - 1})) AS f) fs,
           (SELECT UNNEST(generate_series(0, {n_bytes - 1})) AS j) js
    ),
    gray AS (
      SELECT vid, f, pi, SUM(v) // 3 AS g FROM px GROUP BY vid, f, pi
    ),
    fh AS (
      SELECT a.vid, a.f,
             CAST(SUM(CASE WHEN a.g < b.g THEN
               (1::BIGINT << ((a.pi // {width}) * {width - 1} + (a.pi % {width})))
               ELSE 0 END) AS BIGINT) AS d
      FROM gray a JOIN gray b
        ON b.vid = a.vid AND b.f = a.f AND b.pi = a.pi + 1
      WHERE a.pi % {width} < {width - 1}
      GROUP BY a.vid, a.f
    ),
    sets AS (SELECT DISTINCT vid, d FROM fh)
    SELECT a.vid AS vid_a, b.vid AS vid_b,
           CAST(COUNT(DISTINCT a.d) AS INT) AS shared_frames
    FROM sets a JOIN sets b ON a.d = b.d AND a.vid < b.vid
    GROUP BY a.vid, b.vid
    HAVING COUNT(DISTINCT a.d) >= {min_shared}
    """


@query("c51_video_neardup", oracle=_video_neardup_oracle())
def c51_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5/C2: video near-duplicate detection by shared frame
    fingerprints — each synthesized 3-frame P6 'video' is split by REAL
    header parsing inside mapInPandas, every frame dHashed
    (operators/multimodal.py::video_frame_dhashes), and two videos pair
    when they share >= 2 distinct frame hashes
    (video_neardup_pairs) — candidates only ever come from the
    frame-hash equi-join, never all-pairs, the shot-level fingerprint
    shape that survives a billion-video corpus. Planted structure: 2%
    of docs (doc_id % 100 < 2) get a +1e6 copy whose LAST frame is
    brightened — sharing exactly the first two frames, it still pairs
    at min_shared_frames=2 while the changed frame drops out, and the
    planted-pair count grows LINEARLY with the corpus (the r8 scale-
    step property). The _mix splitmix generator replaced the r7 form's
    (i%40)*29 additive base, which gave every video the same per-frame
    gradients — ALL frame hashes collided, the intended 40-class plant
    drowned in an all-pairs output (~1.2M rows at sf0.1), and the 10x
    scale step stalled on the single hot frame-hash bucket. 56-bit
    mixed frame hashes have no natural cross-video collisions, so the
    output is exactly the planted pairs."""
    from sheetsetl_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")
    n_bytes = 8 * 8 * 3

    def pf(i: int, f: int, j: int) -> int:
        return _mix(i, f * n_bytes + j)

    def pf_pert(i: int, f: int, j: int) -> int:
        return pf(i, f, j) + (64 if f == 2 else 0)

    base = mm.synthesize_ppm_video(
        docs, "doc_id", width=8, height=8, n_frames=3, pixel_fn=pf
    )
    pert = mm.synthesize_ppm_video(
        docs.filter(F.col("doc_id") % 100 < 2),
        "doc_id",
        width=8,
        height=8,
        n_frames=3,
        pixel_fn=pf_pert,
        id_offset=1000000,
    )
    return mm.video_neardup_pairs(
        base.unionAll(pert), min_shared_frames=2
    ).select("vid_a", "vid_b", "shared_frames")


_AUDIO_NEARDUP_ORACLE = f"""
    WITH clips AS (
      SELECT doc_id AS cid, doc_id AS base, 0 AS pert FROM documents
      UNION ALL
      SELECT doc_id + 1000000, doc_id, 1 FROM documents WHERE doc_id % 100 < 2
    ),
    en AS (
      SELECT cid, t // 32 AS w,
             SUM(ABS((({_mix_sql('base', 't')}) % 4096) - 2048
                     + CASE WHEN pert = 1 AND t >= 992 THEN 64 ELSE 0 END)) AS e
      FROM clips, (SELECT UNNEST(generate_series(0, 1023)) AS t) ts
      GROUP BY cid, t // 32
    ),
    eh AS (
      SELECT cid, CAST(SUM(bit) AS BIGINT) AS h FROM (
        SELECT cid, w,
               CASE WHEN e < LEAD(e) OVER (PARTITION BY cid ORDER BY w)
                    THEN (1::BIGINT << w) ELSE 0 END AS bit
        FROM en) b
      WHERE w < 31
      GROUP BY cid
    )
    SELECT a.cid AS clip_a, b.cid AS clip_b,
           CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
    FROM eh a JOIN eh b ON a.cid < b.cid
    WHERE bit_count(xor(a.h, b.h)) <= 1
    """


@query("c52_audio_neardup", oracle=_AUDIO_NEARDUP_ORACLE)
def c52_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5/C2: audio near-duplicate detection over REAL binary payloads —
    each synthesized PCM16 WAV is decoded by walking its RIFF chunks
    inside Arrow mapInPandas (operators/multimodal.py::parse_wav), its
    windowed-energy delta fingerprint computed in exact int64 arithmetic
    (audio_energy_hash — the time-domain cousin of spectral-band
    fingerprints, integer so the DuckDB twin reproduces it bit-for-bit
    where an FFT could not), then EXACT banded Hamming blocking
    (audio_neardup_pairs / _banded_hamming_pairs: pigeonhole recall 1,
    candidates only from the band equi-join). Planted near-dups: 2% of
    docs (doc_id % 100 < 2, linear in the corpus) get a +1e6 copy with
    the LAST 32-sample window nudged louder — flipping at most
    fingerprint bit 30, so every planted pair lands within Hamming 1.
    The _mix splitmix sample generator replaced the r7 form's additive
    i*13, under which clip energy PROFILES were nearly identical
    across clips (all fingerprints collided; the output was
    effectively all-pairs and the banded blocking degenerated — r8
    scale-step finding, same family as c50/c51)."""
    import numpy as np

    from sheetsetl_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")

    # t arrives as a numpy index array (synthesize_wav_audio vectorizes
    # per clip); the mixer runs in uint64 where overflow wraps mod 2^64
    # by definition — the same arithmetic _mix does with Python ints.
    def sfn(i, t):
        t64 = np.asarray(t).astype(np.uint64)
        with np.errstate(over="ignore"):  # uint64 wrap IS the mod-2^64
            h = np.uint64(i) * np.uint64(_MIX_K1) + t64 * np.uint64(_MIX_K2)
            x = (h ^ (h >> np.uint64(31))) % np.uint64(4294967296)
            v = (x * np.uint64(_MIX_K3)) >> np.uint64(24)
        return (v % np.uint64(4096)).astype(np.int64) - 2048

    def sfn_pert(i, t):
        return sfn(i, t) + 64 * (np.asarray(t) >= 992)

    base = mm.synthesize_wav_audio(docs, "doc_id", n_samples=1024, sample_fn=sfn)
    pert = mm.synthesize_wav_audio(
        docs.filter(F.col("doc_id") % 100 < 2),
        "doc_id",
        n_samples=1024,
        sample_fn=sfn_pert,
        id_offset=1000000,
    )
    # 1024 samples / window 32 -> 32 frames -> 31 live delta bits: band
    # over exactly those (hash_bits=31); the r8 100x step caught the
    # 64-bit default leaving band 1 all-zero (whole corpus in one
    # bucket, 125B candidate pairs — a 20-minute hang)
    pairs = mm.audio_neardup_pairs(
        base.unionAll(pert), max_hamming=1, bands=2, window=32, hash_bits=31
    )
    return pairs.select(
        "clip_a", "clip_b", F.col("hamming").cast("int").alias("hamming")
    )


@query(
    "c5b_image_pipeline",
    # The whole binary pipeline is closed-form (synthesized pixel j of
    # image id is (id*7+j)%256; nearest-neighbor 4x4 -> 2x2 keeps pixel
    # indices {0,2,8,10}), so even the mapInPandas decode/resize path is
    # hash-checked against SQL that recomputes the same arithmetic.
    oracle="""
    WITH px AS (
      SELECT d.doc_id, t1.pi, t2.c,
             (d.doc_id * 7 + 3 * t1.pi + t2.c) % 256 AS b
      FROM documents d,
           (SELECT UNNEST([0, 2, 8, 10]) AS pi) t1,
           (SELECT UNNEST([0, 1, 2]) AS c) t2
    )
    SELECT doc_id AS media_id,
           2.0 AS width, 2.0 AS height,
           ROUND(SUM(CASE WHEN c = 0 THEN b END) / 4.0 / 255.0, 6) AS mean_r,
           ROUND(SUM(CASE WHEN c = 1 THEN b END) / 4.0 / 255.0, 6) AS mean_g,
           ROUND(SUM(CASE WHEN c = 2 THEN b END) / 4.0 / 255.0, 6) AS mean_b,
           CAST(MIN(b) AS DOUBLE) AS px_min,
           CAST(MAX(b) AS DOUBLE) AS px_max,
           4.0 AS n_px,
           CAST(23 AS BIGINT) AS n_bytes
    FROM px GROUP BY doc_id
    """,
)
def c5b_image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: the REAL binary media path end-to-end — synthesize a P6 PPM
    per document (operators/multimodal.py::synthesize_ppm_media), resize
    4x4 -> 2x2 with the genuine nearest-neighbor pixel resizer
    (ppm_resizer), then feature-extract with the genuine PPM decoder
    (ppm_bmp_decoder), all inside Arrow-batched mapInPandas. Payload
    bytes never reach the driver and are projected away after decode."""
    from sheetsetl_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")
    media = mm.synthesize_ppm_media(docs, "doc_id", width=4, height=4)
    resized = mm.resize_images(media, 2, 2, resize_fn=mm.ppm_resizer)
    feats = mm.extract_features(
        resized.withColumn(
            "meta",
            F.struct(
                F.col("width"),
                F.col("height"),
                F.lit(None).cast("int").alias("sample_rate"),
                F.lit(None).cast("int").alias("n_frames"),
            ),
        ).select("media_id", "kind", "payload", "meta"),
        decode_fn=mm.ppm_bmp_decoder,
    )
    f = F.col("feature")
    return feats.select(
        "media_id",
        F.element_at(f, 1).alias("width"),
        F.element_at(f, 2).alias("height"),
        F.round(F.element_at(f, 3), 6).alias("mean_r"),
        F.round(F.element_at(f, 4), 6).alias("mean_g"),
        F.round(F.element_at(f, 5), 6).alias("mean_b"),
        F.element_at(f, 6).alias("px_min"),
        F.element_at(f, 7).alias("px_max"),
        F.element_at(f, 8).alias("n_px"),
        "n_bytes",
    )


@query(
    "c34_curation_pipeline",
    # End-to-end composition oracle: each stage replicates the oracle of
    # the operator it reuses (c29 rules, c2's capped-Jaccard pairs, c31's
    # md5 split), so the composed SQL is the composed semantics.
    oracle=f"""
    WITH flags AS (
      SELECT doc_id, source, w FROM (
        SELECT doc_id, source, STRING_SPLIT(text, ' ') AS w,
               LEN(REPLACE(text, ' ', '')) AS nc
        FROM documents) t
      WHERE LEN(w) BETWEEN 30 AND 100000
        AND 1.0 * nc / LEN(w) BETWEEN 3.0 AND 12.0
        AND 1.0 * LEN(LIST_FILTER(w, x -> x IN ('the','a','of','and','to','in'))) / LEN(w) >= 0.05
        AND 1.0 * LEN(LIST_DISTINCT(w)) / LEN(w) >= 0.3
    ),
    toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+2], ' ') AS shingle
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM sh0) t
      WHERE df <= {_SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    dups AS (
      SELECT DISTINCT doc_b AS doc_id
      FROM inter
      JOIN sizes sa ON inter.doc_a = sa.doc_id
      JOIN sizes sb ON inter.doc_b = sb.doc_id
      WHERE ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) >= {_JACCARD_THRESHOLD}
    ),
    kept AS (
      SELECT f.doc_id, f.source, LEN(f.w) AS n_tokens,
             ('0x' || SUBSTRING(MD5(CONCAT('split', ':', CAST(f.doc_id AS VARCHAR))), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM flags f
      WHERE f.doc_id NOT IN (SELECT doc_id FROM dups)
    )
    SELECT CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
           source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM kept GROUP BY 1, 2
    """,
)
def c34_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C34: the composed curation pipeline a pre-training corpus runs —
    heuristic quality gate (c29) -> near-duplicate removal (keep the
    smaller id of every confirmed Jaccard pair, c2's capped universe) ->
    deterministic train/val/test split (c31) -> per-(split, source)
    doc/token report. Every stage is the already-verified operator; this
    entry proves they compose without re-shuffling: the quality gate and
    split are map-side, dedup contributes its own candidate-bounded
    stages, and the final report is one sources x splits aggregate."""
    from sheetsetl_spark.operators.layout import hash_split
    from sheetsetl_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    flags = text.gopher_quality_flags(docs).filter(F.col("passes") == 1).select("doc_id")
    pairs = dedup.ngram_jaccard_pairs(
        docs, threshold=_JACCARD_THRESHOLD, n=3, max_shingle_df=_SHINGLE_DF_CAP
    )
    dups = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    kept = (
        docs.join(flags, "doc_id", "left_semi")
        .join(dups, "doc_id", "left_anti")
        .select("doc_id", "source", F.size(tokens("text")).alias("n_tokens"))
    )
    return (
        hash_split(kept, "doc_id", train_frac=0.8, val_frac=0.1, tag="split")
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def _ann_recall_oracle(
    k: int = 10,
    num_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    num_centroids: int = 16,
    nprobe: int = 4,
) -> str:
    """DuckDB twin of c35: exact top-k recomputed once, the seeded
    banded-LSH and IVF top-k recomputed beside it, recall@k per
    (method, query) from the intersections."""
    from sheetsetl_spark.operators.similarity import hyperplanes

    rpb = num_planes // bands
    bit_exprs = ", ".join(
        "CASE WHEN LIST_DOT_PRODUCT(["
        + ", ".join(repr(v) for v in row)
        + "]::DOUBLE[], v) > 0 THEN '1' ELSE '0' END"
        for row in hyperplanes(num_planes, dim)
    )
    band_vals = ", ".join(str(b) for b in range(bands))
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 LIST_DOT_PRODUCT(qv, c.v)
                   / (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v)))
                 DESC, c.vec_id) AS nn_rank
        FROM e c, q WHERE q.query_id <> c.vec_id) t
      WHERE nn_rank <= {k}
    ),
    sig AS (SELECT vec_id, v, CONCAT({bit_exprs}) AS bits FROM e),
    bnd AS (SELECT UNNEST([{band_vals}]) AS b),
    cstack AS (SELECT vec_id, b, SUBSTRING(bits, b * {rpb} + 1, {rpb}) AS bv FROM sig, bnd),
    qstack AS (SELECT vec_id AS query_id, b, SUBSTRING(bits, b * {rpb} + 1, {rpb}) AS bv
               FROM sig, bnd WHERE vec_id < 8),
    lsh_cand AS (
      SELECT DISTINCT qk.query_id, c.vec_id AS neighbor_id
      FROM cstack c JOIN qstack qk ON c.b = qk.b AND c.bv = qk.bv AND c.vec_id <> qk.query_id
    ),
    lsh_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT cand.query_id, cand.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY cand.query_id ORDER BY
                 LIST_DOT_PRODUCT(qe.v, ce.v)
                   / (SQRT(LIST_DOT_PRODUCT(qe.v, qe.v)) * SQRT(LIST_DOT_PRODUCT(ce.v, ce.v)))
                 DESC, cand.neighbor_id) AS nn_rank
        FROM lsh_cand cand
        JOIN e qe ON qe.vec_id = cand.query_id
        JOIN e ce ON ce.vec_id = cand.neighbor_id) t
      WHERE nn_rank <= {k}
    ),
    cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {num_centroids}),
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
      WHERE rn <= {nprobe}
    ),
    ivf_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
                 LIST_DOT_PRODUCT(qv, a.v)
                   / (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(a.v, a.v)))
                 DESC, a.vec_id) AS nn_rank
        FROM probes p JOIN asg a ON p.cent_id = a.cent_id
        WHERE p.query_id <> a.vec_id) t
      WHERE nn_rank <= {k}
    )
    SELECT 'lsh' AS method, x.query_id,
           COUNT(*) AS n_exact,
           COUNT(a.neighbor_id) AS n_hit,
           ROUND(1.0 * COUNT(a.neighbor_id) / COUNT(*), 6) AS recall_at_k
    FROM exact x
    LEFT JOIN lsh_topk a
      ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
    GROUP BY x.query_id
    UNION ALL
    SELECT 'ivf' AS method, x.query_id,
           COUNT(*) AS n_exact,
           COUNT(a.neighbor_id) AS n_hit,
           ROUND(1.0 * COUNT(a.neighbor_id) / COUNT(*), 6) AS recall_at_k
    FROM exact x
    LEFT JOIN ivf_topk a
      ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
    GROUP BY x.query_id
    """


@query("c35_ann_recall", oracle=_ann_recall_oracle())
def c35_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C35: ANN quality measurement — recall@10 of BOTH approximate
    paths (banded LSH c3b, IVF c3c) against the exact brute-force top-k
    (c3), per (method, query). The validation loop a production ANN
    deployment runs on a sampled query set before trusting an
    approximate path at full scale; the exact side is computed once and
    both measurements are deterministic, so even the recall table is
    hash-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(emb, queries_df, k=10).select(
        "query_id", "neighbor_id"
    )

    def recall_of(approx: DataFrame, method: str) -> DataFrame:
        a = approx.select(
            F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
        )
        joined = exact.join(
            a,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("neighbor_id") == F.col("a_nid")),
            "left",
        )
        return joined.groupBy("query_id").agg(
            F.count("*").alias("n_exact"),
            F.count("a_nid").alias("n_hit"),
            F.round(F.count("a_nid") / F.count("*"), 6).alias("recall_at_k"),
        ).select(F.lit(method).alias("method"), "*")

    lsh = recall_of(similarity.cosine_topk_lsh(emb, queries_df, k=10), "lsh")
    ivf = recall_of(similarity.cosine_topk_ivf(emb, queries_df, k=10), "ivf")
    return lsh.unionByName(ivf)


@query(
    "c36_quality_deciles",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             ROUND(CAST(0.4 AS DOUBLE) * CASE WHEN LENGTH(text) BETWEEN 100 AND 5000
                                              THEN 1 ELSE 0 END
                 + CAST(0.3 AS DOUBLE) * CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                                    t -> t IN ('the','a','of','and','to','in'))) > 0
                                              THEN 1 ELSE 0 END
                 + CAST(0.3 AS DOUBLE) * LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))
                     / LEN(STRING_SPLIT(text, ' ')), 6) AS quality,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             LENGTH(text) AS n_chars
      FROM documents
    ),
    cuts AS (
      SELECT [ROUND(QUANTILE_CONT(quality, 0.1), 6), ROUND(QUANTILE_CONT(quality, 0.2), 6),
              ROUND(QUANTILE_CONT(quality, 0.3), 6), ROUND(QUANTILE_CONT(quality, 0.4), 6),
              ROUND(QUANTILE_CONT(quality, 0.5), 6), ROUND(QUANTILE_CONT(quality, 0.6), 6),
              ROUND(QUANTILE_CONT(quality, 0.7), 6), ROUND(QUANTILE_CONT(quality, 0.8), 6),
              ROUND(QUANTILE_CONT(quality, 0.9), 6)] AS cs
      FROM scored
    ),
    assigned AS (
      SELECT s.*, 1 + LEN(LIST_FILTER(c.cs, x -> s.quality > x)) AS decile
      FROM scored s, cuts c
    )
    SELECT decile,
           COUNT(*) AS n_docs,
           ROUND(MIN(quality), 6) AS min_quality,
           ROUND(MAX(quality), 6) AS max_quality,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / SUM(n_tokens), 6)
             AS chars_per_token
    FROM assigned GROUP BY decile
    """,
)
def c36_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C36: corpus quality-decile diagnostics — exact decile CUT POINTS
    (the x3 percentile parity recipe) broadcast back over the corpus,
    per-row decile assignment map-side, then a 10-row aggregate of
    doc/token mass and score band per decile. The calibration table a
    threshold decision (c20) reads: what would 'drop the bottom 2
    deciles' remove?

    Deliberately NOT a global NTILE window: that plans as a
    one-partition sort of the whole corpus. Percentile cuts + broadcast
    assignment is the shape that survives 100 TB (one aggregate to 9
    numbers + one scan); under score ties decile populations can deviate
    from exactly-N/10, which the report shows honestly in n_docs."""
    docs = load_table(spark, sf_dir, "documents")
    # single source: the SAME quality_score c4b/c20 use, plus size stats
    # from the same scan (a drifted inline copy could bin documents
    # against a different score than the one c20 filters on)
    scored = text.quality_score(docs, with_stats=True).select(
        "doc_id", "quality", "n_tokens", "n_chars"
    )
    cuts = scored.agg(
        F.array(
            *[F.round(F.percentile("quality", F.lit(p / 10)), 6) for p in range(1, 10)]
        ).alias("cs")
    )
    assigned = scored.crossJoin(F.broadcast(cuts)).withColumn(
        "decile",
        F.lit(1) + F.size(F.filter("cs", lambda x: F.col("quality") > x)),
    )
    return assigned.groupBy("decile").agg(
        F.count("*").alias("n_docs"),
        F.round(F.min("quality"), 6).alias("min_quality"),
        F.round(F.max("quality"), 6).alias("max_quality"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(18,6)")).cast("double")
            / F.sum("n_tokens"),
            6,
        ).alias("chars_per_token"),
    )


@query(
    "c37_doclen_histogram",
    oracle="""
    WITH t AS (
      SELECT CAST(FLOOR(LN(LEN(STRING_SPLIT(text, ' '))) / LN(2)) AS BIGINT) AS bucket,
             LEN(STRING_SPLIT(text, ' ')) AS n
      FROM documents
    )
    SELECT bucket,
           CAST(POWER(2, bucket) AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens
    FROM t GROUP BY bucket
    """,
)
def c37_doclen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C37: log2-bucketed document-length histogram — the curation view
    of corpus shape (where the token mass sits by length band; the input
    to a chunking/packing budget decision). One scan, one tiny
    aggregate; the bucket is pure per-row arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    bucket = F.floor(F.log2(n)).cast("bigint")
    return (
        docs.select(bucket.alias("bucket"), n.alias("n"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("n_tokens"))
        .select(
            "bucket",
            F.pow(F.lit(2), F.col("bucket")).cast("bigint").alias("bucket_lo"),
            "n_docs",
            "n_tokens",
        )
    )


def _sig_incremental_oracle(
    threshold: float, num_hashes: int = 16, bands: int = 4, n: int = 3, df_cap: int = 1000
) -> str:
    """DuckDB twin of ``incremental_neardup_filter_sig(hash_family='md5')``:
    rebuilds the md5-prefix minhash SIGNATURES for both sides, the
    ':'-joined band index, the asymmetric candidate join, and the
    minhash-agreement Jaccard estimate — the entire index-maintained
    filter is hash-checked, including its approximation."""
    rpb = num_hashes // bands
    sig_cte = f"""
      SELECT doc_id, i,
             MIN(('0x' || SUBSTRING(MD5(CONCAT(CAST(i AS VARCHAR), ':', CAST(h AS VARCHAR))),
                              1, 15))::BIGINT) AS mh
      FROM hh, (SELECT UNNEST(GENERATE_SERIES(0, {num_hashes - 1})) AS i) fs
      GROUP BY 1, 2
    """
    return f"""
    WITH newb AS (SELECT doc_id, text, lang, n_chars FROM documents WHERE source = 'src0'),
    hist AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
    shn0 AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+{n - 1}], ' ') AS shingle
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM newb) t,
           LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - {n - 1})) AS i) u
    ),
    shn AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM shn0) t
      WHERE df <= {df_cap}
    ),
    sho0 AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+{n - 1}], ' ') AS shingle
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM hist) t,
           LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - {n - 1})) AS i) u
    ),
    sho AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sho0) t
      WHERE df <= {df_cap}
    ),
    famn AS (
      {sig_cte.replace("hh", "(SELECT doc_id, ('0x' || SUBSTRING(MD5(shingle), 1, 15))::BIGINT AS h FROM shn) hh_t")}
    ),
    famo AS (
      {sig_cte.replace("hh", "(SELECT doc_id, ('0x' || SUBSTRING(MD5(shingle), 1, 15))::BIGINT AS h FROM sho) hh_t")}
    ),
    bandn AS (
      SELECT doc_id, i // {rpb} AS band_idx,
             STRING_AGG(CAST(mh AS VARCHAR), ':' ORDER BY i) AS band_val
      FROM famn GROUP BY 1, 2
    ),
    bando AS (
      SELECT doc_id, i // {rpb} AS band_idx,
             STRING_AGG(CAST(mh AS VARCHAR), ':' ORDER BY i) AS band_val
      FROM famo GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
      FROM bandn nb JOIN bando ob
        ON nb.band_idx = ob.band_idx AND nb.band_val = ob.band_val
    ),
    agree AS (
      SELECT c.new_id, c.old_id,
             1.0 * SUM(CASE WHEN fn.mh = fo.mh THEN 1 ELSE 0 END) / {num_hashes} AS est_j
      FROM cand c
      JOIN famn fn ON fn.doc_id = c.new_id
      JOIN famo fo ON fo.doc_id = c.old_id AND fo.i = fn.i
      GROUP BY 1, 2
    ),
    dups AS (SELECT DISTINCT new_id FROM agree WHERE est_j >= {threshold})
    SELECT doc_id, lang, n_chars FROM newb
    WHERE doc_id NOT IN (SELECT new_id FROM dups)
    """


@query(
    "c38_incremental_neardup_sig",
    oracle=_sig_incremental_oracle(threshold=_JACCARD_THRESHOLD),
)
def c38_incremental_neardup_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C38: the INDEX-MAINTAINED incremental dedup path (c28's exact twin
    verifies against history shingles; this one verifies by minhash
    agreement from the stored signature index alone — O(new+collisions)
    per ingest, no history rescan). Runs in the engine-portable md5
    hash family so the whole filter, approximation included, is
    hash-checked against a DuckDB twin that rebuilds the index verbatim.
    See operators/dedup.py::incremental_neardup_filter_sig and
    streaming/pipeline.py::SignatureDedupIngestForeachBatch."""
    docs = load_table(spark, sf_dir, "documents")
    newb = docs.filter(F.col("source") == "src0").select(
        "doc_id", "text", "lang", "n_chars"
    )
    hist = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    index = dedup.minhash_band_table(
        hist, num_hashes=16, bands=4, n=3,
        max_shingle_df=_SHINGLE_DF_CAP, hash_family="md5",
    )
    survivors = dedup.incremental_neardup_filter_sig(
        newb, index, threshold=_JACCARD_THRESHOLD,
        num_hashes=16, bands=4, n=3,
        max_shingle_df=_SHINGLE_DF_CAP, hash_family="md5",
    )
    return survivors.select("doc_id", "lang", "n_chars")

"""Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) and a
dense (embedding-cosine) ranking over the same corpus.

Parity note: the reference (src/loader.py) delegates all querying to a
SQL server and has no retrieval stack at all; this module extends the
C-series retrieval tier (c3 dense, c26 lexical) with the fusion step a
real RAG / search pipeline runs between them. RRF (Cormack et al.,
SIGIR'09) is the standard score-free fusion: each retriever contributes
1/(k0 + rank) for the documents in its top pool, so scales of the two
score distributions never need calibrating.

Scale design: each retriever independently produces a BOUNDED top-pool
via orderBy+limit (TakeOrderedAndProject — per-partition heaps, no
single-partition Exchange; see text.bm25_scores). Fusion then operates
on two <= pool-row frames: the unpartitioned rank windows and the
full-outer join are on driver-bounded data BY CONSTRUCTION, which is
the only place an unpartitioned window is acceptable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sheetsetl_spark.operators import similarity, text


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_cols: list[str] | None = None,
) -> DataFrame:
    """Fuse bounded ranked lists by reciprocal-rank fusion.

    Each input frame must carry (id_col, <rank_col>) with rank starting
    at 1 and AT MOST a bounded pool of rows (the caller guarantees the
    bound — fusion joins are planned for small frames). Documents absent
    from a list contribute 0 from it (standard RRF).

    Output: (id, rrf_score, <rank cols...>) — top-k by (score desc, id),
    score rounded to 6 dp after ordering so ties break identically in
    the DuckDB twin.
    """
    rank_cols = rank_cols or [f"rank_{i}" for i in range(len(ranked))]
    fused = ranked[0]
    for nxt in ranked[1:]:
        fused = fused.join(nxt, id_col, "full_outer")
    score = None
    for rc in rank_cols:
        term = F.coalesce(1.0 / (F.lit(rrf_k) + F.col(rc)), F.lit(0.0))
        score = term if score is None else score + term
    return (
        fused.withColumn("__rrf", score)
        .orderBy(F.col("__rrf").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            F.round("__rrf", 6).alias("rrf_score"),
            *[F.col(rc).cast("int").alias(rc) for rc in rank_cols],
        )
    )


def hybrid_rrf_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    pool: int = 100,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid search: BM25 over `docs.text` for `query_terms`, cosine
    over `embeddings` for the stored query vector, RRF-fused.

    The dense query is the embedding row with ``vec_id == query_vec_id``
    (the fixture corpus aligns doc_id and vec_id; a production pipeline
    would embed the query text — the fusion is identical). The query's
    own vector is excluded from the dense pool (cosine_topk's self-pair
    filter), matching how a retriever never returns the query document.

    Output: (doc_id, rrf_score, lex_rank, dense_rank) — top-k fused.
    """
    # Lexical pool: bm25_scores already ends in TakeOrderedAndProject,
    # so re-deriving rank 1..pool over its <= pool rows is bounded work.
    lex_pool = text.bm25_scores(docs, query_terms, k=pool)
    lex = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .alias("lex_rank"),
    )
    dense = similarity.cosine_topk(
        embeddings, embeddings.filter(F.col("vec_id") == query_vec_id), k=pool
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("nn_rank").alias("dense_rank"))
    return rrf_fuse(
        [lex, dense], k=k, rrf_k=rrf_k, rank_cols=["lex_rank", "dense_rank"]
    )


def ranking_metrics(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "nn_rank",
) -> DataFrame:
    """Retrieval-evaluation metrics per query: MRR, hits@k, precision@k,
    recall@k — the offline eval every retriever (c3/c26/c53) ships with.

    ``ranked``: (query_col, item_col, rank_col) rows, rank 1-based and
    already cut to the top-k pool. ``relevant``: the ground-truth
    (query_col, item_col, n_relevant) pairs, where ``n_relevant`` is the
    TOTAL relevant-item count for that query in the corpus (recall's
    denominator — it must count relevant items the retriever missed, so
    it cannot be derived from ``ranked``).

    Scale: ``ranked`` is bounded (|queries| × k rows by construction);
    the relevance attachment is a left join keyed (query, item) — the
    ground-truth side shuffles on the same key, and per-query metrics
    reduce with map-side partials. Nothing touches the corpus.

    Determinism: hits/ranks are integers; MRR / precision / recall are
    single IEEE divisions of integers, rounded to 6 — bit-stable across
    engines. nDCG's gain terms 1/log2(rank+1) are irrational, so each
    term is rounded to 12 decimals and cast to DECIMAL before the sum —
    decimal addition is order-independent (the registry's float-sum
    recipe), and 12-decimal rounding absorbs any 1-ulp libm difference
    in log2 between engines. The ideal DCG comes from a k-row running
    sum (a single-partition window over EXACTLY k rows — bounded by
    construction, the one place that's acceptable). Queries with no
    relevant item in the pool get rr = ndcg = 0.0 (the standard
    convention), never NULL.
    """

    def _gain(rank: Column) -> Column:
        return F.round(F.lit(1.0) / F.log2(rank + F.lit(1.0)), 12).cast(
            "decimal(28,12)"
        )

    hit = (
        ranked.join(
            # Real judgment tables carry duplicate (query, item) rows
            # (multiple assessors, merged pools); without the distinct
            # the left join fans ranked rows out and inflates every hit
            # -derived metric (r7 advice). n_relevant already tolerates
            # duplicates via max in `totals`.
            relevant.select(query_col, item_col)
            .dropDuplicates([query_col, item_col])
            .withColumn("__rel", F.lit(1)),
            [query_col, item_col],
            "left",
        )
        .groupBy(query_col)
        .agg(
            F.min(F.when(F.col("__rel") == 1, F.col(rank_col))).alias("__first"),
            F.sum(F.coalesce(F.col("__rel"), F.lit(0))).alias("hits_at_k"),
            F.sum(
                F.when(F.col("__rel") == 1, _gain(F.col(rank_col))).otherwise(
                    F.lit(0).cast("decimal(28,12)")
                )
            ).alias("__dcg"),
        )
    )
    totals = relevant.groupBy(query_col).agg(
        F.max("n_relevant").alias("__n_rel")
    )
    idcg = ranked.sparkSession.range(1, k + 1).select(
        F.col("id").alias("__m"),
        F.sum(_gain(F.col("id"))).over(Window.orderBy("id")).alias("__idcg"),
    )
    return (
        hit.join(totals, query_col, "left")
        .join(
            F.broadcast(idcg),
            F.least(F.lit(k), F.col("__n_rel")) == F.col("__m"),
            "left",
        )
        .select(
            query_col,
            F.coalesce(
                F.round(F.lit(1.0) / F.col("__first"), 6), F.lit(0.0)
            ).alias("rr"),
            F.col("hits_at_k").cast("long").alias("hits_at_k"),
            F.round(F.col("hits_at_k") / F.lit(k), 6).alias("precision_at_k"),
            F.coalesce(
                F.round(F.col("hits_at_k") / F.col("__n_rel"), 6), F.lit(0.0)
            ).alias("recall_at_k"),
            F.coalesce(
                F.round(
                    F.col("__dcg").cast("double") / F.col("__idcg").cast("double"),
                    6,
                ),
                F.lit(0.0),
            ).alias("ndcg_at_k"),
        )
    )

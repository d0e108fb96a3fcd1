"""Similarity-search operators (SURVEY §2-C C3/C5): exact cosine top-k and
an LSH-bucketed approximate variant over ArrayType(Float) embeddings.

Scale design: the exact form broadcasts the (small) query set against the
candidate corpus — at 100 TB the corpus side streams through executors
once, per-query top-k folds inside TakeOrdered-style windows. The LSH form
buckets by random-hyperplane signatures so candidate generation is an
equi-join, the ANN pattern that survives billion-vector corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> Column:
    """Double-precision dot product via zip_with + left-fold aggregate.

    The fold is sequential over the array, so the result is bit-exact and
    reproducible (matches DuckDB's list_dot_product on the same doubles).
    """
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """C3 exact baseline: brute-force cosine top-k for each query vector.

    Output: (query_id, neighbor_id, rank, sim) with sim rounded to 6 for
    hash-stability; rank ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    sim = _dot("qv", "cv") / (F.sqrt(_dot("qv", "qv")) * F.sqrt(_dot("cv", "cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "nn_rank", F.round("sim", 6).alias("sim"))
    )


def _hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes (seeded, platform-free)."""
    import hashlib

    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"sheetsetl:{p}:{d}".encode()).digest()
            row.append(1.0 if h[0] % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """C3 scale path: random-hyperplane LSH bucketing, then exact cosine
    within each bucket. Approximate (recall < 1) — driver records the
    rows-only check for this one; the exact twin is the oracle query."""
    planes = _hyperplanes(num_planes, dim)
    plane_lits = F.array(*[F.array(*[F.lit(v) for v in row]) for row in planes])

    def sig(df: DataFrame, out: str) -> DataFrame:
        vec = F.col(vec_col).cast("array<double>")
        bits = F.transform(
            plane_lits,
            lambda row: (
                F.aggregate(
                    F.zip_with(row, vec, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
                )
                > 0
            ).cast("int"),
        )
        return df.select(
            F.col(id_col).alias(out),
            vec.alias(f"{out}_v"),
            F.concat_ws("", bits).alias(f"{out}_bucket"),
        )

    q = sig(queries, "query_id")
    c = sig(embeddings, "neighbor_id")
    joined = c.join(
        F.broadcast(q), F.col("neighbor_id_bucket") == F.col("query_id_bucket")
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    dot = F.aggregate(
        F.zip_with(F.col("query_id_v"), F.col("neighbor_id_v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nq = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("query_id_v"), F.col("query_id_v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nc = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("neighbor_id_v"), F.col("neighbor_id_v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = joined.select("query_id", "neighbor_id", (dot / (nq * nc)).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "nn_rank", F.round("sim", 6).alias("sim"))
    )

"""Graph ranking operators: fixed-round PageRank over an edge list.

Parity note: the reference (src/loader.py) delegates querying to MySQL
and has no graph capability; this extends the engine's iterative tier
(c2f min-label connected components, b42b/b42c recursive closure) with
the canonical damped random-surfer ranking (Brin & Page '98 — public
algorithm), the shape any link/citation/interaction importance job at
corpus scale takes.

Determinism contract: every per-round float (the contribution
r(u)/outdeg(u) and the updated rank) rounds to 6 dp immediately, and
in-edge contributions accumulate in exact DECIMAL — so both engines
walk bit-identical rank vectors round by round, and the DuckDB twin
(an unrolled CTE chain) hash-checks every iteration's arithmetic, not
just the final ordering.

Scale shape: one shuffle per round (contributions grouped by dst);
out-degrees computed once; the node count enters as a broadcast
one-row aggregate. Rank state is O(nodes) and stays distributed —
nothing is collected. For deep iteration counts, localCheckpoint the
rank frame per round (the c2f frontier pattern) to keep lineage flat;
at the fixed shallow depth used here plain lineage is cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-round PageRank over a directed edge list.

    The caller supplies edges (symmetrize first for an undirected
    graph — which also removes dangling-node mass, since every node
    then has out-degree >= 1). Ranks start uniform at round(1/N, 6) and
    update as ``round((1-d)/N + d * sum(contrib), 6)`` with
    ``contrib = round(r(u)/outdeg(u), 6)`` decimal-summed per target.

    Output: (node, pr) for every node after ``iters`` rounds.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_row = nodes.agg(F.count("*").cast("double").alias("n"))
    r = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", F.round(F.lit(1.0) / F.col("n"), 6).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            e.join(r, e["src"] == r["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst"),
                F.round(F.col("pr") / F.col("outdeg"), 6).alias("c"),
            )
        )
        sums = contrib.groupBy("dst").agg(
            F.sum(F.col("c").cast("decimal(28,6)")).cast("double").alias("s")
        )
        r = (
            nodes.join(sums, nodes["node"] == sums["dst"], "left")
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    6,
                ).alias("pr"),
            )
        )
    return r


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    top: int = 20,
    max_group_size: int | None = None,
) -> DataFrame:
    """Market-basket co-occurrence: the most frequent unordered item
    pairs sharing a group (order, session, document...).

    Scale shape: the pair stream is a SELF-EQUI-JOIN on the group key —
    fanout is bounded by group size, quadratic only within a group, so
    the optional ``max_group_size`` cap (the max_bucket_size precedent
    from MinHash-LSH) drops degenerate mega-groups before they square.
    Items are deduped per group first (one map-side-combining distinct),
    the a<b predicate halves the pair stream at the join, and top-N is
    TakeOrderedAndProject.

    Output: (item_a, item_b, n_groups) for the ``top`` pairs, ties
    broken by (item_a, item_b).
    """
    items = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    if max_group_size is not None:
        sizes = items.groupBy("g").agg(F.count("*").alias("__gs"))
        items = (
            items.join(sizes, "g")
            .filter(F.col("__gs") <= max_group_size)
            .drop("__gs")
        )
    a = items.select("g", F.col("item").alias("item_a"))
    b = items.select("g", F.col("item").alias("item_b"))
    pairs = a.join(b, "g").filter(F.col("item_a") < F.col("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_groups"))
        .orderBy(F.col("n_groups").desc(), F.col("item_a"), F.col("item_b"))
        .limit(top)
    )

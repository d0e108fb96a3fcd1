"""Graph operators: fixed-iteration weighted PageRank.

Complements operators/dedup.py::connected_components (the other iterative
graph primitive): PageRank ranks nodes by stationary visit probability —
domain authority for crawl prioritization, influence scoring over
citation/link graphs in corpus curation.

Scale design: each iteration is one join of the edge list against the
current rank vector (both keyed on src — co-partitioned after the first
shuffle) plus one aggregation keyed on dst. No driver-side state, no
collect; iteration count is fixed and small, so the plan stays static
(checkpoint between rounds past ~10 iterations, like
functions/iterative.py does for the recursive fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    deterministic_fold: bool = True,
) -> DataFrame:
    """Weighted PageRank, ``iters`` fixed rounds from a uniform start.

    rank_{t+1}(v) = (1-d)/N + d * sum_{(u,v) in E} rank_t(u) * w(u,v) / out_w(u)

    (no dangling-mass redistribution: every src in ``edges`` has
    out-weight by construction; nodes with no in-edges settle at
    (1-d)/N).

    ``deterministic_fold=True`` sums each node's incoming contributions
    in src order via an explicit sorted fold, so the double arithmetic is
    bit-identical on ANY partitioning and engine — that makes the full
    iterative pipeline DuckDB-hash-checkable. The fold materializes one
    array per destination node, fine up to ~1e5 in-degree hubs; for
    power-law web graphs pass ``deterministic_fold=False`` to use a
    plain associative sum (order-dependent in the last ulp, still
    convergent — standard practice at that scale).
    """
    # explode, not self-union: the union form would evaluate the edges
    # subtree twice (it may itself be a join pipeline)
    nodes = (
        edges.select(F.explode(F.array(F.col(src), F.col(dst))).alias("node"))
        .distinct()
    )
    outw = edges.groupBy(src).agg(F.sum(weight).alias("__ow"))
    n_nodes = nodes.agg(F.count("*").cast("double").alias("__n"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    e = edges.join(outw, src).select(
        F.col(src).alias("__src"),
        F.col(dst).alias("__dst"),
        (F.col(weight) / F.col("__ow")).alias("__share"),
    )
    for _ in range(iters):
        contrib = e.join(ranks, e["__src"] == ranks["node"]).select(
            F.col("__dst").alias("node"),
            "__src",
            (F.col("rank") * F.col("__share")).alias("__c"),
        )
        if deterministic_fold:
            summed = contrib.groupBy("node").agg(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(F.col("__src"), F.col("__c")))),
                        lambda x: x["__c"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("__s")
            )
        else:
            summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 10).alias("rank"))


def pagerank_rounded(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Unweighted fixed-round PageRank under the 6-dp round-then-
    decimal-sum contract (contrast :func:`pagerank` above, the weighted
    form whose determinism comes from a src-ordered fold instead):
    every per-round float — the contribution r(u)/outdeg(u) and the
    updated rank — rounds to 6 dp immediately and in-edge contributions
    accumulate in exact DECIMAL, so both engines walk bit-identical
    rank vectors round by round and an unrolled CTE chain hash-checks
    every iteration (c56). Symmetrize the edge list first for an
    undirected graph (which also removes dangling-node mass).

    Scale shape: one dst-keyed shuffle per round; out-degrees computed
    once; node count is a broadcast one-row aggregate; rank state stays
    distributed. Output: (node, pr) after ``iters`` rounds.
    """
    s, d = F.col(src_col), F.col(dst_col)
    e = edges.select(s.alias("src"), d.alias("dst")).distinct()
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

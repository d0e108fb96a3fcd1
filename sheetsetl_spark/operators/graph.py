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

"""10x scale step for the round-7 batch-4/5/6 heavies (extends the r6
verdict-item-6 protocol of examples/scale_step_bench.py).

- c69 (BPE trainer) and c72 (prefix-filter Jaccard) run at sf0.1 and at
  the sf1-ish documents fixture (examples/make_sf1ish.py — vocabulary-
  permuted replicas, so near-dup structure grows linearly while shingle
  document frequency grows ~10x, the honest worst case for c72's
  prefix-join fanout).
- The graph ops (c67 triangles, c74 k-core) scale on 10 DISJOINT
  id-shifted replicas of the sf0.1 co-purchase graph: edges x10 at
  IDENTICAL degree distribution, so a linear wall-time ratio certifies
  the degree-ordered wedge join / peel rounds scale with edge count,
  not worse. (Replicating orders instead would collapse under the edge
  DISTINCT; permuting parts would change the degree law.)

Warm-pass protocol (scale_step_batch2 lesson): each measurement runs
twice and reports the second pass, cache cleared in between runs of
DIFFERENT queries but kept within a query's pair so JIT/codegen
amortizes out of the ratio.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sheetsetl_spark.operators import graph
from sheetsetl_spark.queries import QUERIES
from sheetsetl_spark.queries.mining_ext import _copurchase_edges
from sheetsetl_spark.session import build_session

DOC_HEAVY = ["c69_bpe_train_apply", "c72_prefix_filter_jaccard"]


def timed(fn):
    fn()  # warm pass
    start = time.perf_counter()
    rows = fn()
    return time.perf_counter() - start, rows


def main() -> None:
    sf1ish = os.environ.get("SF1ISH_DIR", "/tmp/sf1ish")
    spark = build_session(app_name="scale-step-b3")
    spark.sparkContext.setLogLevel("ERROR")

    for sf in ("/root/testdata/sf0.1", sf1ish):
        for name in DOC_HEAVY:
            spark.catalog.clearCache()
            wall, rows = timed(lambda: QUERIES[name](spark, sf).count())
            print(f"{sf} {name}: {wall:.2f}s rows={rows}", flush=True)

    base = _copurchase_edges(spark, "/root/testdata/sf0.1").persist()
    n_base = base.count()
    replicas = [
        base.select(
            (F.col("src") + F.lit(k * 10_000_000)).alias("src"),
            (F.col("dst") + F.lit(k * 10_000_000)).alias("dst"),
        )
        for k in range(10)
    ]
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionAll(r)
    big = big.persist()
    n_big = big.count()
    print(f"graph edges: 1x={n_base} 10x={n_big}", flush=True)

    for label, edges in (("1x", base), ("10x", big)):
        wall, _ = timed(lambda: graph.triangle_stats(edges).count())
        tri = graph.triangle_stats(edges).collect()[0]
        print(
            f"graph {label} triangles: {wall:.2f}s n_triangles={tri.n_triangles}"
            f" n_wedges={tri.n_wedges}",
            flush=True,
        )
        wall, rows = timed(lambda: graph.kcore(edges, k=70, rounds=4).count())
        print(f"graph {label} kcore(70): {wall:.2f}s nodes={rows}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()

"""End-to-end example: embedding-side corpus tooling.

The vector half of a training-data platform, composed from
sheetsetl_spark.operators the way a production job would wire them:

    embeddings -> PCA (whitened, top-k dims) -> ANN search on the
    reduced vectors -> embedding near-dup pairs -> duplicate clusters

PCA reduces scan bandwidth for the search stage (64 -> 8 dims here);
every stage is deterministic (decimal moments, canonical eigen signs,
seeded hyperplanes), so re-running on any cluster/partitioning yields
identical neighbors and clusters.

    python examples/embed_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sheetsetl_spark.cache import cache_scope
from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.operators import dedup
from sheetsetl_spark.operators.decomposition import fit_pca, pca_project
from sheetsetl_spark.operators.similarity import cosine_topk
from sheetsetl_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="embed-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. PCA: one moment aggregation + driver-side 64x64 eigen; the
    #    corpus streams once more for the zero-shuffle projection.
    mean, comps, var = fit_pca(emb, k=8, dim=64)
    total_var = sum(v for v in var)
    reduced = pca_project(emb, k=8, dim=64, whiten=False).withColumnRenamed(
        "proj", "embedding"
    )
    print(f"PCA: top-8 components explain {total_var:.4f} summed variance")

    # 2. ANN over the REDUCED vectors: 8x less scan bandwidth per
    #    comparison; queries = first 5 vectors (any query table works).
    queries = reduced.filter(F.col("vec_id") < 5)
    topk = cosine_topk(reduced, queries, k=3)
    print("top-3 neighbors in PCA space (first queries):")
    for r in topk.orderBy("query_id", "nn_rank").limit(9).collect():
        print(f"  q={r.query_id} -> {r.neighbor_id} (rank {r.nn_rank}, sim {r.sim})")

    # 3. Near-dup pairs on the ORIGINAL vectors (hyperplane-LSH blocking,
    #    exact cosine verification) -> duplicate clusters.
    with cache_scope():
        pairs = dedup.embedding_neardup_pairs(emb, threshold=0.98)
        clusters = dedup.connected_components(pairs, "vec_a", "vec_b")
        n_pairs = pairs.count()
        n_clustered = clusters.count()
    print(f"near-dup: {n_pairs} pairs over {n_clustered} clustered vectors")
    spark.stop()


if __name__ == "__main__":
    main()

"""Round-9 batch 2: 100x walls for the rest of the ANN ladder and the
embedding near-dup family (after c55's multi-consumer find, check its
siblings empirically rather than by code-reading alone)."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from sheetsetl_spark.session import build_session  # noqa: E402

NAMES = [
    "c3_topk_cosine",
    "c3b_topk_cosine_lsh",
    "c3c_topk_cosine_ivf",
    "c3d_topk_cosine_int8",
    "c2e_embedding_neardup",
    "c49_incremental_embedding_neardup",
]


def main() -> None:
    spark = build_session(app_name="scale100x-r9b")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    from sheetsetl_spark.queries import QUERIES

    names = sys.argv[1:] or NAMES
    for name in names:
        q = QUERIES[name]
        q(spark, "/root/testdata/sf0.001").count()  # warm
        for tag, d in [("sf0.1", "/root/testdata/sf0.1"),
                       ("10x", "/tmp/sf1ish"), ("100x", "/tmp/sf100ish")]:
            t0 = time.time()
            n = q(spark, d).count()
            print(f"RESULT {name} {tag}: {time.time()-t0:.1f}s rows={n}",
                  flush=True)


if __name__ == "__main__":
    main()

"""10x scale step for the round-7 batch-2 heavy operators.

Runs c53 (hybrid RRF), c54 (winnowing), c55 (PQ ANN) and c49
(incremental embedding near-dup) once at sf0.1 and once at the sf1-ish
fixture (examples/make_sf1ish.py), recording wall time and output rows.
Protocol refinement over examples/scale_step_bench.py: each (sf, query)
pair runs an UNTIMED warm pass first, then the timed pass — the first
timed run of a fresh session otherwise absorbs JVM/session cold-start
(observed: c53 "7.86s at sf0.1 vs 2.54s at 10x", an impossible
inversion, purely because c53 ran first). Cache cleared per run,
count() materialization, idle machine required (SCALE.md round-7
contamination note). Results go into SCALE.md.

Known fixture collision: c49's "must survive" planted batch is the
base vectors rolled by 7 coordinates — and make_sf1ish.py builds
replica 7 by rolling by 7, so at 10x the planted batch finds EXACT
(cos=1.0) twins in the stored index and is correctly dropped
(rows=0). That is the operator detecting a real duplicate, not a
recall loss; the timing remains the honest 10x-index number.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sheetsetl_spark.queries import QUERIES
from sheetsetl_spark.session import build_session

HEAVY = [
    "c53_hybrid_rrf_search",
    "c54_winnowing_fingerprints",
    "c55_topk_cosine_pq",
    "c49_incremental_embedding_neardup",
]


def main() -> None:
    sf1ish = os.environ.get("SF1ISH_DIR", "/tmp/sf1ish")
    spark = build_session(app_name="scale-step-b2")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in ("/root/testdata/sf0.1", sf1ish):
        for name in HEAVY:
            spark.catalog.clearCache()
            QUERIES[name](spark, sf).count()  # warm pass (JIT, code cache)
            spark.catalog.clearCache()
            start = time.perf_counter()
            rows = QUERIES[name](spark, sf).count()
            wall = time.perf_counter() - start
            print(f"{sf} {name}: {wall:.2f}s rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

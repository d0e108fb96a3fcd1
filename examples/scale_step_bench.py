"""10x scale step for the heavy C-series (r6 verdict item 6).

Runs c2b/c2e/c45/c3c once at sf0.1 and once at the sf1-ish fixture
(examples/make_sf1ish.py), recording wall time and output rows; for c2b
additionally counts DISTINCT CANDIDATE pairs (threshold=0 makes every
candidate survive verification, so the output count IS the candidate
count) and probes max_shingle_df cap behavior with an artificially tight
cap. Results go into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.operators import dedup
from sheetsetl_spark.queries import QUERIES
from sheetsetl_spark.session import build_session

HEAVY = ["c2b_minhash_lsh", "c2e_embedding_neardup", "c45_duplicated_passages", "c3c_topk_cosine_ivf"]


def main() -> None:
    sf1ish = os.environ.get("SF1ISH_DIR", "/tmp/sf1ish")
    spark = build_session(app_name="scale-step")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in ("/root/testdata/sf0.1", sf1ish):
        for name in HEAVY:
            spark.catalog.clearCache()
            start = time.perf_counter()
            rows = QUERIES[name](spark, sf).count()
            wall = time.perf_counter() - start
            print(f"{sf} {name}: {wall:.2f}s rows={rows}", flush=True)
        # c2b candidate-pair count (threshold=0 -> output == candidates)
        for cap, label in ((1000, "cap=1000"), (50, "cap=50")):
            spark.catalog.clearCache()
            docs = load_table(spark, sf, "documents")
            start = time.perf_counter()
            cands = dedup.minhash_lsh_pairs(
                docs, threshold=0.0, num_hashes=32, bands=8, n=3, max_shingle_df=cap
            ).count()
            wall = time.perf_counter() - start
            print(f"{sf} c2b candidates {label}: {wall:.2f}s pairs={cands}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

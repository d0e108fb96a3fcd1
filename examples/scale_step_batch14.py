"""10x scale step for the round-7 batch-8/9/10 heavy operators the r7
verdict listed as unmeasured (item 7): the multimodal near-dup family
(c49-c52), hybrid RRF retrieval (c53) and the PQ ANN ladder rung (c55).
Same warm-pass protocol as scale_step_bench.py; fixture from
make_sf1ish.py. Results recorded in SCALE.md ("batch-14" entry).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sheetsetl_spark.queries import QUERIES
from sheetsetl_spark.session import build_session

NAMES = [
    "c49_incremental_embedding_neardup",
    "c50_image_neardup",
    "c51_video_neardup",
    "c52_audio_neardup",
    "c53_hybrid_rrf_search",
    "c55_topk_cosine_pq",
]


def main() -> None:
    sf1ish = os.environ.get("SF1ISH_DIR", "/tmp/sf1ish")
    spark = build_session(app_name="scale-step-b14")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in ("/root/testdata/sf0.1", sf1ish):
        for name in NAMES:
            spark.catalog.clearCache()
            QUERIES[name](spark, sf).count()  # warm pass, discarded
            spark.catalog.clearCache()
            start = time.perf_counter()
            rows = QUERIES[name](spark, sf).count()
            wall = time.perf_counter() - start
            print(f"{sf} {name}: {wall:.2f}s rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

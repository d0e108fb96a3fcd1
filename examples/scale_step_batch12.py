"""10x scale step for the round-7 batch-12/13 operators (same warm-pass
protocol as scale_step_bench.py; fixture from make_sf1ish.py). Results
recorded in SCALE.md ("batch-12/13" entry) — including the c94
pair-generator switch this run caught (df-capped c2 generator: 209.9s
at 10x; prefix-filtered c72 generator: 24.0s, same output).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sheetsetl_spark.queries import QUERIES
from sheetsetl_spark.session import build_session

NAMES = [
    "c88_quantile_normalize",
    "c90_topk_cosine_lsh_multiprobe",
    "c92_word_dropout",
    "c93_span_corruption",
    "c94_quality_canonical_dedup",
    "c95_contamination_report",
    "c96_token_budget_sample",
]


def main() -> None:
    sf1ish = os.environ.get("SF1ISH_DIR", "/tmp/sf1ish")
    spark = build_session(app_name="scale-step-b12")
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

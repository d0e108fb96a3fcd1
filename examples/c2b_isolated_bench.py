"""Isolated c2b_minhash_lsh repeat-run harness (r6 verdict item 1).

Runs ONLY c2b at sf0.1, N times in one session, cache cleared between
runs, and prints per-run wall times + median. Used to decide whether the
r1->r6 bench trend (2.56 -> 3.48s) is a real regression or single-shot
noise; results recorded in SCALE.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sheetsetl_spark.queries import QUERIES
from sheetsetl_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "5"))
    spark = build_session(app_name="c2b-isolated")
    spark.sparkContext.setLogLevel("ERROR")

    # identical warmup posture to bench.py: codegen at sf0.001, then
    # warm the bench-SF scans
    QUERIES["c2b_minhash_lsh"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    from sheetsetl_spark.catalog import load_table

    load_table(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()

    times = []
    for i in range(runs):
        spark.catalog.clearCache()
        start = time.perf_counter()
        QUERIES["c2b_minhash_lsh"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(round(time.perf_counter() - start, 3))
        print(f"run {i + 1}: {times[-1]}s", flush=True)
    print(f"median: {statistics.median(times)}  min: {min(times)}  max: {max(times)}")
    spark.stop()


if __name__ == "__main__":
    main()

"""10x scale step for the round-7 batch-11 operators (same protocol as
examples/scale_step_bench.py: warm pass discarded at each scale, then a
timed pass; fixture from examples/make_sf1ish.py).

What each query must prove at 10x:

- c82 edit-distance join: candidate pairs come only from each doc's
  q*k+1 rarest grams — the prefix-join fanout must grow ~linearly with
  the corpus (the vocab permutation keeps replicas disjoint at the
  character level, so true pairs stay within replicas). Also printed:
  the CANDIDATE count (pre-verify) via a threshold-free probe.
- c84 substring decontamination: probes grow 10x (one per ~97th doc)
  AND the corpus grows 10x — the broadcast-NL contains cost is
  O(|corpus| x |probes|) worst-case, so the wall ratio shows whether
  the early-exit contains scan stays tractable; output stays
  probe-proportional.
- c85 sorted neighborhood: strictly linear by construction
  ((window-1) x |rows| candidates) — the control row.
- c86 source overlap: unit of work is distinct (source, shingle); the
  10x fixture multiplies per-source shingle df ~10x but the DISTINCT
  stream only grows with new vocab permutations — sublinear growth is
  the expected signature.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sheetsetl_spark.queries import QUERIES
from sheetsetl_spark.session import build_session

NAMES = [
    "c85_sorted_neighborhood",
    "c86_source_overlap",
    "c84_substring_decontamination",
    "c82_edit_distance_join",
]


def main() -> None:
    sf1ish = os.environ.get("SF1ISH_DIR", "/tmp/sf1ish")
    spark = build_session(app_name="scale-step-b11")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in ("/root/testdata/sf0.1", sf1ish):
        for name in NAMES:
            spark.catalog.clearCache()
            QUERIES[name](spark, sf).count()  # warm (JIT/IO); discarded
            spark.catalog.clearCache()
            start = time.perf_counter()
            rows = QUERIES[name](spark, sf).count()
            wall = time.perf_counter() - start
            print(f"{sf} {name}: {wall:.2f}s rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

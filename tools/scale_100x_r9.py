"""Round-9 100x scale measurements (VERDICT r8 item 5):

1. c69_bpe_train_apply and c55_topk_cosine_pq at 10x and 100x
   (/tmp/sf1ish, /tmp/sf100ish from examples/make_sf1ish.py).
2. The c72 LSH FALLBACK measured: SCALE.md's exact-Jaccard 100x law
   shows the prefix-filter candidate mass grows ~quadratically on the
   df-saturated fixture (1.83B candidates), naming banded MinHash-LSH
   as the corpus-scale path. Here we (a) quantify the fallback's RECALL
   against the exact c72 output at 10x (where exact is feasible), and
   (b) record its 100x wall.

Usage: python tools/scale_100x_r9.py [c69|c55|c72lsh|all]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from sheetsetl_spark.session import build_session  # noqa: E402


def wall(fn, *args):
    t0 = time.time()
    n = fn(*args).count()
    return time.time() - t0, n


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = build_session(app_name="scale100x-r9")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    from sheetsetl_spark.queries import QUERIES

    if which in ("c69", "all"):
        q = QUERIES["c69_bpe_train_apply"]
        q(spark, "/root/testdata/sf0.001").count()  # warm
        for tag, d in [("sf0.1", "/root/testdata/sf0.1"),
                       ("10x", "/tmp/sf1ish"), ("100x", "/tmp/sf100ish")]:
            w, n = wall(q, spark, d)
            print(f"RESULT c69 {tag}: {w:.1f}s rows={n}", flush=True)

    if which in ("c55", "all"):
        q = QUERIES["c55_topk_cosine_pq"]
        q(spark, "/root/testdata/sf0.001").count()  # warm
        for tag, d in [("sf0.1", "/root/testdata/sf0.1"),
                       ("10x", "/tmp/sf1ish"), ("100x", "/tmp/sf100ish")]:
            w, n = wall(q, spark, d)
            print(f"RESULT c55 {tag}: {w:.1f}s rows={n}", flush=True)

    if which in ("c72lsh", "all"):
        from sheetsetl_spark.catalog import load_table
        from sheetsetl_spark.operators import dedup

        def lsh(sf_dir):
            docs = load_table(spark, sf_dir, "documents")
            # c72's contract (threshold 0.5, word 3-shingles, NO df cap
            # — the fallback must chase the same target set)
            return dedup.minhash_lsh_pairs(
                docs, threshold=0.5, num_hashes=32, bands=8, n=3
            )

        lsh("/root/testdata/sf0.001").count()  # warm
        # recall vs exact at 10x: exact c72 is feasible there (r7: 18s)
        t0 = time.time()
        exact = {
            (r.doc_a, r.doc_b)
            for r in QUERIES["c72_prefix_filter_jaccard"](spark, "/tmp/sf1ish")
            .select("doc_a", "doc_b").collect()
        }
        t_exact = time.time() - t0
        t0 = time.time()
        approx = {
            (r.doc_a, r.doc_b)
            for r in lsh("/tmp/sf1ish").select("doc_a", "doc_b").collect()
        }
        t_lsh10 = time.time() - t0
        hit = len(exact & approx)
        print(
            f"RESULT c72lsh 10x: exact={t_exact:.1f}s ({len(exact)} pairs) "
            f"lsh={t_lsh10:.1f}s ({len(approx)} pairs) "
            f"recall={hit/len(exact):.4f} precision_vs_exact="
            f"{hit/max(1,len(approx)):.4f}", flush=True,
        )
        w, n = wall(lsh, "/tmp/sf100ish")
        print(f"RESULT c72lsh 100x: {w:.1f}s rows={n}", flush=True)


if __name__ == "__main__":
    main()

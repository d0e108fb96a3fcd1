"""Per-query perf probe for the optimization rounds.

Times individual registry queries with the noop sink (guide §1.4) on the
bench session (same confs/core count as bench.py), optionally dumping the
formatted physical plan. Unlike bench.py this is a scalpel: pick queries,
pick pass count, get per-pass samples immediately.

    python tools/perfprobe.py c82_edit_distance_join c69_bpe_train_apply
    python tools/perfprobe.py --plan plans/r11 --suffix before c82_edit_distance_join
    python tools/perfprobe.py --passes 5 c2b_minhash_lsh

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import contextlib
import gc
import io
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sheetsetl_spark.queries import QUERIES  # noqa: E402
from sheetsetl_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plan", default=None, help="directory to write formatted plans")
    ap.add_argument("--suffix", default="before", help="plan filename suffix")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="perfprobe")
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    if not args.no_warm:
        for name in args.names:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        from sheetsetl_spark.catalog import TABLES, load_table

        for table in TABLES:
            try:
                load_table(spark, sf_dir, table).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass

    if args.plan:
        os.makedirs(args.plan, exist_ok=True)
        for name in args.names:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plan, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"plan -> {args.plan}/{name}_{args.suffix}.txt")

    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for p in range(args.passes):
        spark.catalog.clearCache()
        for name in args.names:
            spark.sparkContext.setJobDescription(f"probe:{name}:pass{p}")
            start = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - start, 3))
            gc.collect()
    for name, vals in samples.items():
        print(
            f"{name}: median={statistics.median(vals):.3f}s "
            f"min={min(vals):.3f} max={max(vals):.3f} samples={vals}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Plan inspector CLI: print the formatted physical plan of any registry
query — the .explain("formatted") loop the scale design is iterated with.

    python -m sheetsetl_spark.explain b21_groupby_agg [sf_dir]
"""

from __future__ import annotations

import sys


def main() -> None:
    if len(sys.argv) < 2:
        from sheetsetl_spark.queries import QUERIES

        print("usage: python -m sheetsetl_spark.explain <query> [sf_dir]")
        print("queries:", ", ".join(sorted(QUERIES)))
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from sheetsetl_spark.queries import QUERIES
    from sheetsetl_spark.session import build_session

    spark = build_session(app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[name](spark, sf_dir)
    df.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()

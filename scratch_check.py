"""Scratch: run named new queries against their DuckDB oracles at sf0.001."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from sheetsetl_spark.session import build_session  # noqa: E402
from sheetsetl_spark.queries import QUERIES, ORACLES  # noqa: E402
from oracle import compare  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
names = sys.argv[2:]
spark = build_session()
ok, bad = [], []
for name in names:
    try:
        compare(QUERIES[name](spark, SF), ORACLES[name], SF)
        ok.append(name)
        print(f"PASS {name}")
    except Exception as e:
        bad.append(name)
        print(f"FAIL {name}: {str(e)[:500]}")
print(f"\n{len(ok)} pass, {len(bad)} fail: {bad}")

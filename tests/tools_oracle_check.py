"""Dev helper (not a pytest module): run named queries against their DuckDB oracles.

Usage: python tests/tools_oracle_check.py [sf_dir] name [name...]
"""
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

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

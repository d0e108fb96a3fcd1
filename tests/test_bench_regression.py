"""Per-query bench regression guard.

BENCH_r01.json (21.181 s / 26 headline queries at sf0.1) is the recorded
baseline; a plan change that makes any headline query >2x slower than its
recorded time fails here loudly instead of surfacing in the next round's
driver bench.

Slow (runs the full headline set at the bench SF) — skipped unless
SHEETSETL_BENCH_GUARD=1; run explicitly before committing plan-shape
changes:

    SHEETSETL_BENCH_GUARD=1 python -m pytest tests/test_bench_regression.py -q
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SHEETSETL_BENCH_GUARD") != "1",
    reason="bench guard is opt-in (SHEETSETL_BENCH_GUARD=1); ~1 min at sf0.1",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(REPO, "BENCH_r01.json")
# Per-query floor: wall times under ~0.5 s are dominated by fixed overhead
# (job submit, codegen cache) where 2x is noise, not a plan regression.
MIN_COMPARABLE_SEC = 0.5
FACTOR = 2.0


def test_headline_queries_within_2x_of_recorded_baseline():
    with open(BASELINE_PATH) as f:
        baseline = json.load(f)
    # the driver wraps bench.py's JSON line under "parsed"
    baseline = baseline.get("parsed", baseline)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
        cwd=REPO,
    ).stdout.strip().splitlines()[-1]
    current = json.loads(out)

    regressions = []
    for name, base_sec in baseline["queries"].items():
        cur_sec = current["queries"].get(name)
        if cur_sec is None:
            continue  # headline set may rotate; absence is not a regression
        if base_sec >= MIN_COMPARABLE_SEC and cur_sec > FACTOR * base_sec:
            regressions.append((name, base_sec, cur_sec))
    assert not regressions, (
        f"headline queries regressed beyond {FACTOR}x of BENCH_r01: {regressions}"
    )
    # total-level sanity as well
    assert current["value"] <= FACTOR * baseline["value"], (
        f"total bench {current['value']}s vs baseline {baseline['value']}s"
    )

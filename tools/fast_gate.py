#!/usr/bin/env python
"""Fast verification gate: the full non-slow test core, sharded across
parallel pytest processes so a cold reviewer can certify green in one
sitting (<5 min on this machine; single-process it is ~5:40).

Every shard runs `pytest -m "not slow"` over a disjoint subset of test
files — nothing is skipped relative to the single-process gate, the
shards just overlap in wall-clock. Shard logs go to /tmp and each
shard's tail is echoed at the end; exit code is the worst shard's.

    python tools/fast_gate.py [N_SHARDS]   # default 3

The `slow` marker (pytest.ini) holds the heavy RE-verification layer:
hypothesis brute-force twins, streaming soak, randomized fixture and
threshold sweeps. Run the full suite (`pytest tests/ -q`, ~25 min)
before release; the fast gate is the per-change loop.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile
import time

# Measured single-file wall seconds (round-8 timing run); files not
# listed default to a light weight. Only used to BALANCE shards — a new
# heavy file lands somewhere and merely unbalances until re-measured.
WEIGHTS = {
    "tests/test_oracle_queries.py": 200,
    "tests/test_operators.py": 99,
    "tests/test_pipeline.py": 56,
    "tests/test_analytics_ext6.py": 48,
    "tests/test_analytics_ext3.py": 31,
    "tests/test_tpch_partsupp.py": 31,
    "tests/test_prefix_sum.py": 25,
    "tests/test_mining_ext.py": 30,
    "tests/test_plan_shapes_ext4.py": 28,
    "tests/test_plan_shapes_ext2.py": 28,
    "tests/test_ivf_index.py": 25,
    "tests/test_drive_source.py": 25,
    "tests/test_scale_layout.py": 24,
    "tests/test_plan_shapes_ext3.py": 24,
    "tests/test_functions.py": 22,
    "tests/test_drive_http.py": 19,
    "tests/test_annotation_curation.py": 19,
    "tests/test_decomposition.py": 18,
    "tests/test_collation.py": 17,
    "tests/test_dedup_recall.py": 16,
}
DEFAULT_WEIGHT = 15


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(here)
    files = sorted(glob.glob("tests/test_*.py"))
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in sorted(files, key=lambda f: -WEIGHTS.get(f, DEFAULT_WEIGHT)):
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += WEIGHTS.get(f, DEFAULT_WEIGHT)

    start = time.monotonic()
    procs = []
    logs = []
    for i, shard in enumerate(shards):
        log = tempfile.NamedTemporaryFile(
            "w+", prefix=f"fastgate_shard{i}_", suffix=".log", delete=False
        )
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "pytest", "-q", "-m", "not slow", *shard],
                stdout=log,
                stderr=subprocess.STDOUT,
            )
        )
    codes = [p.wait() for p in procs]
    wall = time.monotonic() - start
    ok = True
    for i, (code, log) in enumerate(zip(codes, logs)):
        log.flush()
        with open(log.name) as fh:
            tail = fh.readlines()[-3:]
        print(f"--- shard {i} (exit {code}, log {log.name}) ---")
        sys.stdout.writelines(tail)
        # pytest exit 5 = no tests collected (an all-slow shard) — fine
        ok = ok and code in (0, 5)
    print(f"fast gate: {'GREEN' if ok else 'RED'} in {wall:.0f}s ({n} shards)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

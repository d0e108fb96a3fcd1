"""BPE merge-application equivalence: the r10 regexp_replace rewrite of
_bpe_apply_merge must implement EXACT greedy left-to-right
non-overlapping pairing — the same selection the streak-parity windows
computed, and the same contract the c69 DuckDB CTE-chain oracle checks.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F


def _greedy_reference(toks: list[str], x: str, y: str) -> list[str]:
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def test_regex_merge_equals_greedy_pairing_pure_python():
    """Java and Python re share the left-to-right non-overlapping
    semantics the pattern relies on; sweep random token sequences
    (including x == y adjacent-site chains and multi-char tokens, with
    and without a trailing space) against the reference greedy scan."""
    random.seed(7)
    alpha = list("ab_")
    for trial in range(20000):
        toks = [random.choice(alpha) for _ in range(random.randint(2, 12))]
        if trial % 3 == 0:
            toks = [
                "".join(random.choices(alpha, k=random.randint(1, 3)))
                for _ in toks
            ]
        x, y = random.choice(toks), random.choice(toks)
        s = " " + " ".join(toks) + (" " if trial % 2 else "")
        got = re.sub(f" {x} {y}(?=[ ]|$)", f" {x}{y}", s).split()
        assert got == _greedy_reference(toks, x, y), (toks, x, y)


def test_spark_merge_matches_reference_on_chain_cases(spark):
    """The canonical traps through the real operator expression: the
    'banana' adjacent-site chain, an x == y run, and a pair at end of
    string (the $ lookahead branch)."""
    from sheetsetl_spark.operators.text import _bpe_apply_merge

    rows = [
        (1, " b a n a n a"),  # (a, n): [b, an, an, a]
        (2, " a a a"),        # (a, a): [aa, a]
        (3, " x a n"),        # (a, n) at end of string
        (4, " n a _ n a"),    # no site for (a, n)
    ]
    cur = spark.createDataFrame(rows, "id long, toks string")
    got = {
        r["id"]: r["toks"].split()
        for r in _bpe_apply_merge(cur, "a", "n").collect()
    }
    assert got[1] == ["b", "an", "an", "a"]
    assert got[3] == ["x", "an"]
    assert got[4] == ["n", "a", "_", "n", "a"]
    got2 = {
        r["id"]: r["toks"].split()
        for r in _bpe_apply_merge(cur, "a", "a").collect()
    }
    assert got2[2] == ["aa", "a"]

"""Fast literal-array construction for the Python driver.

Building a K x D literal matrix with ``F.array(*[F.array(*[F.lit(v) ...``
costs one py4j round-trip PER ELEMENT — measured 1.78 s per build for the
32x64 hyperplane matrix (2048 lits), paid on EVERY DataFrame
construction, i.e. every bench pass and every query invocation. That
driver-side tax dominated the embedding-family queries: c49's steady
state was ~4.4 s of DataFrame build vs ~1.2 s of execution (r11
measurement). Rendering the same values into ONE SQL expression string
and parsing it with a single ``F.expr`` call costs ~4 ms to build and
~0.13 s to analyze, and Catalyst constant-folds the parsed
``array(array(...))`` into a single Literal during optimization, so
executor-side behavior is bit-identical.

Exactness: ``repr(float)`` is Python's shortest round-trip rendering and
Spark's ``...D`` double literal parses with Java's correctly-rounded
``Double.parseDouble``, so every finite value survives the text
round-trip bit-for-bit (property-tested in tests/test_functions.py).
Non-finite values have no SQL literal form — those fall back to the
per-element path (no call site ships them today).
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt(v: float) -> str:
    f = float(v)
    if not math.isfinite(f):
        raise ValueError("non-finite")
    return repr(f) + "D"


def lit_double_array(vals: Iterable[float]) -> Column:
    """``array<double>`` literal via one parsed SQL expression (one py4j
    call instead of one per element)."""
    vals = list(vals)
    try:
        return F.expr("array(" + ",".join(_fmt(v) for v in vals) + ")")
    except ValueError:  # non-finite element: per-element fallback
        return F.array(*[F.lit(float(v)) for v in vals])


def lit_double_matrix(rows: Sequence[Sequence[float]]) -> Column:
    """``array<array<double>>`` literal via one parsed SQL expression."""
    try:
        return F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(_fmt(v) for v in row) + ")" for row in rows
            )
            + ")"
        )
    except ValueError:
        return F.array(*[F.array(*[F.lit(float(v)) for v in row]) for row in rows])

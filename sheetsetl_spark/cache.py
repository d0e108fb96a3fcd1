"""Cache lifecycle management for operators that persist intermediates.

Several dedup operators persist an intermediate DataFrame (the shingle
stream, the band table) because multiple downstream consumers would
otherwise rescan the corpus. The returned pair DataFrame is LAZY, so the
operator itself can never safely unpersist — the caller hasn't consumed
the result yet. Historically the contract was "long-lived sessions should
``spark.catalog.clearCache()`` between runs", which is a foot-gun: it
nukes every cache in the session, including ones the application owns.

:func:`cache_scope` replaces that contract with a scoped one::

    with cache_scope():
        pairs = minhash_lsh_pairs(docs, threshold=0.8)
        pairs.write.parquet(out)        # consume INSIDE the scope
    # every intermediate the operator persisted is now unpersisted

Operators register their persists through :func:`scoped_persist`. Inside
an active scope the entry is tracked and unpersisted (non-blocking) at
scope exit; outside any scope the behavior is exactly the old one (the
entry lives until the caller clears it — Spark's cache manager keys on
the canonicalized plan, so repeated identical calls reuse one entry
rather than accumulating).

Correctness is never at stake: unpersisting a DataFrame only discards
cached blocks — a result consumed after scope exit recomputes from
lineage. The scope is purely a lifetime bound on executor/storage memory,
which is what matters in a 100 TB session running many dedup passes.

Scopes nest: each persist registers with the innermost active scope.
Thread-local, so concurrent driver threads (e.g. parallel pipeline
branches) each get independent scopes.
"""

from __future__ import annotations

import contextlib
import threading
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LOCAL = threading.local()


def _scope_stack() -> list[list[DataFrame]]:
    if not hasattr(_LOCAL, "stack"):
        _LOCAL.stack = []
    return _LOCAL.stack


def scoped_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df``; if a :func:`cache_scope` is active, register the
    entry for unpersist at scope exit. Drop-in for ``df.persist()``."""
    out = df.persist(level) if level is not None else df.persist()
    stack = _scope_stack()
    if stack:
        stack[-1].append(out)
    return out


@contextlib.contextmanager
def cache_scope() -> Iterator[list[DataFrame]]:
    """Bound the lifetime of operator-internal caches to this block.

    Yields the (initially empty) list of tracked DataFrames, mostly for
    introspection in tests. On exit every tracked entry is unpersisted
    (non-blocking); errors during unpersist are swallowed — a stopped
    session has nothing left to free.
    """
    entries: list[DataFrame] = []
    stack = _scope_stack()
    stack.append(entries)
    try:
        yield entries
    finally:
        stack.pop()
        for df in entries:
            try:
                df.unpersist()
            except Exception:
                pass

"""MySQL default case-insensitive collation emulation (opt-in).

The reference ships analyst SQL verbatim to a MySQL 5.7 server
(/root/reference/src/loader.py:231) whose default collation is
case-INSENSITIVE (latin1_swedish_ci / utf8_general_ci): there,
``WHERE name = 'smith'`` matches ``'Smith'``, and ``DISTINCT`` /
``GROUP BY`` / ``ORDER BY`` all fold case. Spark compares binary by
default — the largest silently-different-answer class left in the
delegated surface (r6 verdict, "What's missing" #2).

Spark 4 ships string collations, which makes the MySQL model directly
expressible: collation is a property of the COLUMN TYPE, not the query
text, so collating the source views once makes every downstream
comparison, grouping, distinct, and sort case-insensitive without
touching the analyst SQL — exactly how a ci-collated MySQL schema
behaves. ``register_views(..., case_insensitive=True)`` (catalog.py)
applies this to the whole fixture catalog; off by default, preserving
the binary behavior every existing oracle checks.

``UTF8_LCASE`` folds case per Unicode simple case mapping (ASCII
included), the closest Spark analog of utf8_general_ci. Differences in
exotic-codepoint tailoring between the two are out of scope — analyst
corpora here are ASCII.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

CI_COLLATION = "UTF8_LCASE"


def ci_collate_strings(df: DataFrame, collation: str = CI_COLLATION) -> DataFrame:
    """Return ``df`` with every top-level string column re-typed to the
    given collation (default ``UTF8_LCASE``).

    One projection, fully Catalyst-side (``collate`` is a type
    annotation, not a data transform — zero per-row cost), so pushdown
    and pruning through it are unaffected. Nested struct/array string
    fields are left binary: the fixture catalog and the reference's
    analyst tables are flat; extend per-field if a nested corpus needs
    folding.
    """
    fields = df.schema.fields
    if not any(isinstance(f.dataType, StringType) for f in fields):
        return df
    return df.select(
        *[
            F.collate(F.col(f.name), collation).alias(f.name)
            if isinstance(f.dataType, StringType)
            else F.col(f.name)
            for f in fields
        ]
    )

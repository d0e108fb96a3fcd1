"""Round-7 batch-11 extensions, fuzzy-matching / data-management tier:
exact edit-distance self-join (Ed-Join prefix+count filters), table
snapshot diff, and a one-pass column profiler.

Scale contracts:
- The edit-distance join generates candidates ONLY from each string's
  q*k+1 globally-rarest q-grams (a completeness THEOREM, not a blocking
  heuristic — the brute-force DuckDB twin certifies zero lost pairs),
  then verifies candidate-proportionally: length filter, array
  count-filter, and the O(len^2) DP only on survivors.
- Snapshot diff is one full-outer equi-join on the key comparing
  row fingerprints — the change-data shape every 100 TB ingest
  reconciliation needs; output is proportional to the CHANGED set.
- The column profiler computes every column's stats in ONE corpus scan
  (a single aggregate over conditional expressions), then unpivots the
  one-row result via stack() — never one scan per column.

Registry determinism contract as usual (queries/__init__.py): exact
integers end-to-end here — counts, distances, and min/max emitted as
strings; no float accumulation anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query

# Edit-distance join parameters: the corpus is the deterministic
# mid-length band (the seeded near-dup pairs have near-equal lengths, so
# the band keeps pairs together while bounding the brute-force oracle's
# O(n^2) DP cost at driver-gate scale).
_ED_K = 6
_ED_Q = 3
_ED_LO = 200
_ED_HI = 400


@query(
    "c82_edit_distance_join",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE n_chars BETWEEN {_ED_LO} AND {_ED_HI}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE abs(length(a.text) - length(b.text)) <= {_ED_K}
      AND levenshtein(a.text, b.text) <= {_ED_K}
    """,
)
def c82_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (near-dup tier): EXACT Levenshtein self-join via
    positional q-gram prefix + count filtering
    (operators/dedup.py::edit_distance_pairs, the Ed-Join family).
    Upgrades fuzzy_name_pairs' last-token blocking HEURISTIC to a
    completeness theorem: the oracle is the UNCAPPED brute-force
    levenshtein join, so the hash match certifies that candidates drawn
    only from each doc's q*k+1 rarest grams lose not one true pair.
    Reference parity: the reference engine has no fuzzy matching at all
    (SELECT delegation, reference src/loader.py:231) — this is the
    C-series entity-resolution extension at training-corpus scale."""
    from sheetsetl_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").between(_ED_LO, _ED_HI)
    )
    return dedup.edit_distance_pairs(docs, k=_ED_K, q=_ED_Q)

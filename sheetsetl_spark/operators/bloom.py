"""Bloom-filter join pre-filtering: the shuffle-avoidance pattern where
a compact membership sketch of the build side prunes the probe side
BEFORE the join's exchange.

Parity note: the reference (src/loader.py) delegates joins to MySQL and
has no pruning infrastructure; Spark itself injects runtime bloom
pruning (spark.sql.optimizer.runtime.bloomFilter.enabled) when stats
warrant it. This operator REIFIES the technique so its semantics are
testable engine-portably: bit positions use the md5-prefix hash family
(shared with the DuckDB twin and the CMS sketch), the set bits live as
a distinct-position table (bounded by the bit width), and a probe key
passes iff ALL k of its positions are set. The false-positive rate is
MEASURED against the exact semi-join, not asserted — the same
discipline as the LSH recall harness (c35).

Scale shape: the position table is <= width rows no matter how large
the build side (distinct of k positions per key, map-side combining).
Probing is k BROADCAST joins against that bounded table — broadcast
hash joins never move the probe side, so the probe stream is pruned
in place with zero Exchange (plan-tested), which is the entire point
of a bloom pre-filter. At 100 TB you'd let Spark's built-in bloom join
do this; the operator exists to pin the semantics and measure the FPR
knob (width/k vs build cardinality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position(key: Column, i: int, width: int) -> Column:
    """Bloom bit position i for a key: md5-prefix-60bit("i:key") mod
    width — the engine-portable family (text._cms_buckets)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(width))


def bloom_bits(
    build: DataFrame, key_col: str, width: int = 4096, k: int = 3
) -> DataFrame:
    """The filter itself: the distinct set positions of the build keys,
    as a single-column (pos) table bounded by ``width`` rows."""
    return (
        build.select(
            F.explode(
                F.array(*[_position(F.col(key_col), i, width) for i in range(k)])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_annotate(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    width: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Probe rows with a ``__bloom_pass`` boolean: true iff all k of the
    key's positions are set in the build side's filter.

    k progressive broadcast LEFT joins against the bounded position
    table — each adds one null-able marker; no Exchange on the probe."""
    bits = bloom_bits(build, build_key, width=width, k=k)
    out = probe
    markers = []
    for i in range(k):
        pcol, mcol = f"__pos{i}", f"__hit{i}"
        side = bits.select(F.col("pos").alias(pcol), F.lit(1).alias(mcol))
        out = (
            out.withColumn(pcol, _position(F.col(probe_key), i, width))
            .join(F.broadcast(side), pcol, "left")
            .drop(pcol)
        )
        markers.append(mcol)
    passed = F.lit(True)
    for mcol in markers:
        passed = passed & F.col(mcol).isNotNull()
    return out.withColumn("__bloom_pass", passed).drop(*markers)


def bloom_prefilter(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    width: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Probe rows that PASS the bloom filter of the build keys — a
    superset of the exact semi-join by construction (no false
    negatives: tested); the surplus is what bloom_fpr_report measures."""
    return (
        bloom_annotate(probe, build, probe_key, build_key, width=width, k=k)
        .filter(F.col("__bloom_pass"))
        .drop("__bloom_pass")
    )


def bloom_fpr_report(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    group_col: str,
    width: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Per-group accounting of the bloom pre-filter against the exact
    semi-join: rows scanned, rows passed, true members, false positives,
    and the measured false-positive rate among true non-members.

    Output: (group, n_rows, n_passed, n_true, n_false_pos, fpr)."""
    annotated = bloom_annotate(
        probe.select(group_col, probe_key), build, probe_key, build_key,
        width=width, k=k,
    )
    true_keys = (
        build.select(F.col(build_key).alias(probe_key))
        .distinct()
        .withColumn("__true", F.lit(1))
    )
    flagged = annotated.join(F.broadcast(true_keys), probe_key, "left")
    is_fp = F.col("__bloom_pass") & F.col("__true").isNull()
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("__bloom_pass").cast("int")).alias("n_passed"),
            F.sum(F.coalesce(F.col("__true"), F.lit(0))).alias("n_true"),
            F.sum(is_fp.cast("int")).alias("n_false_pos"),
            F.round(
                F.sum(is_fp.cast("int"))
                / F.sum(F.col("__true").isNull().cast("int")),
                6,
            ).alias("fpr"),
        )
        .orderBy(group_col)
    )

"""Data-layout operators: z-order clustering for multi-column data
skipping, deterministic sharding / hash splits / weighted sampling, and
weighted curriculum interleaving — how a training-data set is CUT and
ORDERED once its contents are decided.

Parquet readers prune row groups with min/max stats, but stats only help
if the layout clusters values. Sorting by one column destroys locality
for the other; interleaving the bits of both (a Morton / z-order curve)
gives every file a tight min/max range on BOTH columns — the technique
behind Delta/Iceberg's OPTIMIZE ZORDER, here as a plain DataFrame
transform: compute the z-value, range-partition and sort by it, write.

At 100 TB this is the difference between scanning every file and pruning
~(1 - selectivity) of them for either predicate column.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_value(c1: Column | str, c2: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    columns into one z-value (c1 -> even bit positions, c2 -> odd).
    Pure shift/mask expressions — whole-stage codegen compiles them."""
    a = F.col(c1) if isinstance(c1, str) else c1
    b = F.col(c2) if isinstance(c2, str) else c2
    a = a.cast("long")
    b = b.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x + y, terms)


def zorder_by(
    df: DataFrame, c1: str, c2: str, num_files: int = 8, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` along the z-curve of (c1, c2): range-partition into
    ``num_files`` output partitions by z-value and sort inside each, so
    every written file covers a compact rectangle of the key space and
    its parquet min/max stats prune for predicates on EITHER column."""
    z = zorder_value(c1, c2, bits=bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def deterministic_shards(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Assign every row a reproducible (shard_id, pos) for training-data
    assembly: shard = md5-hash bucket of (seed, id), pos = rank of the
    same hash within the shard. The full corpus ordering is a pure
    function of (ids, seed) — re-running on any cluster, any partitioning,
    any row order yields byte-identical shards, which is what makes a
    training run resumable and ablatable.

    Scale: one hash-partition shuffle on shard_id + one in-shard sort
    (window per shard). With n_shards sized to the cluster (thousands at
    100 TB) each shard sorts independently; no global sort, no driver
    state. Pair with ParquetDirSink(partition_by='shard_id') to emit one
    directory per shard.
    """
    from pyspark.sql import Window

    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    sharded = df.withColumn("__k", key).withColumn(
        "shard_id", (F.conv(F.substring("__k", 1, 8), 16, 10).cast("bigint") % n_shards)
    )
    w = Window.partitionBy("shard_id").orderBy("__k", id_col)
    return sharded.withColumn("pos", F.row_number().over(w)).drop("__k")


def hash_split(
    df: DataFrame,
    id_col: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    tag: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: a uniform in [0,1) from
    md5(tag:id) buckets every row into train/val/test by the configured
    fractions. Pure per-row hashing — no shuffle, no sampling state, and
    the assignment is a pure function of (id, tag): stable across
    clusters, re-runs, and corpus re-partitioning, so eval rows can never
    leak into train between pipeline versions (the property partition-
    dependent randomSplit cannot give).

    Adds a ``split`` column; fractions are train, val, remainder test.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(tag), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    return df.withColumn(
        "split",
        F.when(u < train_frac, F.lit("train"))
        .when(u < train_frac + val_frac, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 50,
    tag: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis '06, the A-ES exponential-race form — public algorithm):
    each row draws u from the md5(tag:id) uniform and races with key
    -ln(u) / weight; the k SMALLEST keys are the sample. Inclusion
    probability is proportional to weight, and — like hash_split — the
    sample is a pure function of (ids, weights, tag): partition-order
    free, stable across clusters and re-runs (the property
    df.sample(weights) cannot give), so a data-mix ablation can be
    re-cut byte-identically months later.

    Scale: pure per-row hashing + one TakeOrderedAndProject — no
    shuffle, no sampling state. Weights must be > 0 (raise_error guard:
    a zero weight divides to infinity and silently never samples; a
    negative one inverts the race).

    Output: (id, weight, ws_key) for the k winners, ws_key rounded to
    6 dp after ordering (ties broken by id).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(tag), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(1)
    ) / F.lit(1152921504606846976.0)  # 2^60: u in (0, 1]
    w = F.when(F.col(weight_col) > 0, F.col(weight_col).cast("double")).otherwise(
        F.raise_error(
            F.lit("weighted_sample: weights must be > 0 (zero never samples, negative inverts the race)")
        )
    )
    key = -F.log(u) / w
    return (
        df.select(F.col(id_col), F.col(weight_col).alias("weight"), key.alias("__key"))
        .orderBy(F.col("__key").asc(), F.col(id_col))
        .limit(k)
        .select(id_col, "weight", F.round("__key", 6).alias("ws_key"))
    )


def curriculum_interleave(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    limit: int | None = None,
) -> DataFrame:
    """Deterministic weighted interleave of sources — the global read
    order a training run consumes when source s should contribute a
    weights[s] share of every prefix of the stream (the "sample without
    replacement, proportionally, from the first batch onward" layout a
    data-mixing spec compiles to; complements c19's integer-replication
    epoch weights, which change WHAT is in the set, not its ORDER).

    Each source's k-th row (1-based, ordered by id for reproducibility)
    lands at position (k - 0.5) / weight on a shared axis; sorting all
    rows by that position interleaves the sources so every prefix of
    length L holds ~L * weight[s] / sum(weights) rows of source s (the
    classic stride-scheduling / weighted fair queueing pattern, public
    algorithm). Integer k over an exact double division makes the
    position reproducible bit-for-bit on any engine; ties (equal-weight
    sources hit the same position) break by (source, id).

    Sources missing from `weights` are excluded — a mixing spec is an
    allowlist, and silently defaulting a weight would change the mix.

    Output: (ordinal, source, id, position) with position rounded to
    6 dp after ordering.

    Scale: one shuffle for the per-source row_number (partition by
    source; skewed mega-sources are ordered by id within their own
    partition only), then a global sort — which Spark executes as a
    range-partitioned exchange, the same shape as any 100 TB
    ORDER BY-and-write. The global ordinal is row_number over the
    position order; for a write-to-shards consumer the ordinal can be
    dropped and the sorted write relied on instead.
    """
    if not weights:
        raise ValueError("curriculum_interleave: weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("curriculum_interleave: weights must be > 0")
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in (kv[0], float(kv[1]))]
    )
    per_source = Window.partitionBy("source").orderBy(F.col("id").asc())
    ranked = (
        df.select(
            F.col(source_col).alias("source"), F.col(id_col).alias("id")
        )
        .filter(F.col(source_col).isin(list(weights)))
        .select(
            "source",
            "id",
            (
                (F.row_number().over(per_source) - F.lit(0.5))
                / wmap[F.col("source")]
            ).alias("__pos"),
        )
    )
    ordered = ranked.select(
        F.row_number()
        .over(
            Window.partitionBy().orderBy(
                F.col("__pos").asc(), F.col("source").asc(), F.col("id").asc()
            )
        )
        .alias("ordinal"),
        "source",
        "id",
        F.round("__pos", 6).alias("position"),
    )
    return ordered.filter(F.col("ordinal") <= limit) if limit else ordered


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "budget",
) -> DataFrame:
    """Per-group token-budget selection — the "fill each source's slice
    of the training mix to N tokens" step: documents take a
    reproducible pseudo-random order within their group (md5-uniform of
    (seed, id) — any cluster or engine draws the same order), then the
    group keeps its ordered prefix while the running token count stays
    within ``budget_tokens``. Unlike ratio-based mix weighting
    (apply_mix_weights), the constraint here is the TOKEN budget, which
    is what a training recipe actually specifies.

    Shape: one keyed window per group (the running sum partitions on
    the group key — never a corpus-wide window); token counts are one
    `size(split(...))` projection. The boundary rule is "keep while
    cum <= budget" — deterministic, and a doc is never split.

    Output: (id, group, n_tokens, cum_tokens) for kept docs.
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    w = (
        Window.partitionBy(group_col)
        .orderBy(h, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(group_col),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )

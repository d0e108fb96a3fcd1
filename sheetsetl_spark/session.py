"""SparkSession factory tuned for this engine.

The reference runs a single serial process against a remote MySQL server
(/root/reference/src/loader.py:54-58, 227); our execution engine is Spark
SQL + Catalyst + Tungsten + AQE. This module centralizes the session
configuration so every entry point (tests, bench, pipeline shell) gets the
same dialect and scale posture.

Scale notes (100 TB design): every config here is also valid on a real
cluster — AQE handles skew/partition coalescing at runtime, shuffle
partition counts are sized from available parallelism, and nothing below
assumes local mode except the default master.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def _default_driver_mem() -> str:
    """Size the local-mode JVM heap from the machine, not a constant.

    In local mode the driver JVM IS the executor: its heap backs every
    task's shuffle/aggregate memory across all N threads, plus cached /
    localCheckpoint blocks. The old fixed 12g default left a 42-query
    bench session GC-bound on a 128 GiB machine — measured 73.8 s at
    12g vs 56.7 s at 48g for the identical bench (r11), with the
    per-pass spikes (x86 26 s, x98 13 s) that mark old-gen collections
    (guide §7.3: "high GC time = memory pressure"). 3/8 of physical
    RAM (floored at 12g, capped at 48g) keeps the same posture on
    smaller sandboxes and leaves plenty for the OS page cache that
    parquet re-reads rely on. Env-overridable; on a real cluster this
    conf sizes only the driver and spark.executor.memory carries the
    executors (guide §5.1)."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        total_gb = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / (1 << 30)
        )
    except (ValueError, OSError, AttributeError):
        total_gb = 32.0
    want = min(48, max(12, int(total_gb * 3 / 8)))
    # Cap by what the machine can actually give RIGHT NOW: Xms = Xmx +
    # AlwaysPreTouch commits the whole heap at startup, so a session
    # opened next to already-running JVMs (concurrent test shards, a
    # bench beside a pipeline) would die in the gateway handshake if it
    # insisted on the idle-machine size (measured: the third 47g shard
    # of the r11 fast gate, JAVA_GATEWAY_EXITED). 80% of MemAvailable
    # leaves room for Python, off-heap and the page cache. On the idle
    # machine the cap is far above `want`, so bench sizing stays
    # deterministic; under contention the session degrades to a smaller
    # heap instead of a dead JVM. The floor stays at 12g — below that a
    # 32-thread local session thrashes anyway (r10 measurement).
    avail_gb = _mem_available_gb()
    if avail_gb is not None:
        want = min(want, max(12, int(avail_gb * 0.8)))
    return f"{want}g"


def _mem_available_gb() -> float | None:
    """Linux MemAvailable in GiB, or None when unreadable (non-Linux)."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) / (1 << 20)
    except (OSError, ValueError, IndexError):
        return None
    return None


def _mem_to_mb(mem: str) -> int | None:
    """'46g' / '12288m' / '1t' -> MiB, or None if unparseable."""
    m = re.fullmatch(r"\s*(\d+)\s*([kmgt]?)b?\s*", mem.lower())
    if not m:
        return None
    mult = {"k": 1 / 1024, "": 1 / (1 << 20), "m": 1, "g": 1024, "t": 1 << 20}
    return int(int(m.group(1)) * mult[m.group(2)])


def _driver_java_opts(mem: str) -> str:
    """Fixed, fully pre-touched heap (r11, guide §5/§7.3).

    With the default on-demand heap, G1 commits regions as the working
    set grows and UNCOMMITS them again after concurrent cycles; on this
    VM class each commit/uncommit is an mmap/munmap whose TLB
    shootdowns stall every executor thread. The kernel signature was
    unmistakable — 80-89% system time, 32+ runnable threads, ~8k
    interrupts/s while user CPU sat idle — and the cost was huge:
    c82_edit_distance_join median 20.1 s (spikes to 57.6 s) on the
    default heap vs 4.1 s (max 6.1) with a pre-touched 12g floor,
    identical code. -Xms sets the floor G1 may never shrink below;
    +AlwaysPreTouch commits and zeroes it ONCE at session start
    (outside every timed region) instead of page-by-page inside query
    execution.

    Xms = Xmx, not a partial floor: with a 12g floor under a 47g max,
    the first full-scale pass of every query still grew the heap above
    the floor and paid the churn (measured: first-pass spikes c2b
    17.6 s / c55 18.0 s / c52 15.6 s on the capped floor vs 3.6 / 2.5
    / 1.8 with the full heap pre-touched; steady-state medians equal).
    The one-time zeroing of the full heap happens at session start,
    before any timed region."""
    mem_mb = _mem_to_mb(mem)
    if mem_mb is None:
        return "-XX:+AlwaysPreTouch"
    return f"-Xms{mem_mb}m -XX:+AlwaysPreTouch"


#: Production streaming posture. RocksDB replaces the default in-heap
#: HDFSBackedStateStore: state lives off-heap/on-disk in a RocksDB
#: instance per state-store partition, so long-horizon watermarks /
#: dedup keys / session windows are bounded by local disk instead of
#: executor heap — the difference between surviving and OOMing when a
#: 100 TB backfill replays through a stateful query. Changelog
#: checkpointing uploads per-batch deltas instead of full snapshots,
#: keeping commit latency flat as state grows. (File-source ingest rate
#: limiting is per-reader — ``maxFilesPerTrigger`` in
#: ``read_event_stream`` — not a session conf.)
STREAMING_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def apply_streaming_posture(spark: SparkSession) -> None:
    """Pin :data:`STREAMING_CONF` on an existing session. These confs are
    read when a streaming query STARTS, so setting them at runtime (e.g.
    on a shared test session) is equivalent to build-time for any query
    started afterwards."""
    for k, v in STREAMING_CONF.items():
        spark.conf.set(k, v)


def build_session(
    app_name: str = "sheetsetl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    streaming: bool = False,
) -> SparkSession:
    """Build a SparkSession with the engine's dialect + perf defaults.

    - ANSI off: MySQL-like leniency. The reference ships raw analyst SQL to
      MySQL (loader.py:231); MySQL's implicit coercions are far looser than
      Spark ANSI mode, so the compatible posture is non-ANSI.
    - UTC session timezone: deterministic timestamp rendering.
    - ``nanosAsLong``: the events fixture stores TIMESTAMP(NANOS), which
      Spark 4 cannot read natively; the catalog converts ns->us explicitly.
    - AQE on: runtime join re-planning, skew-join splitting, partition
      coalescing — the levers that keep plans healthy at 100 TB.
    - ``streaming=True`` additionally pins :data:`STREAMING_CONF`
      (RocksDB state store + changelog checkpointing) for sessions whose
      primary workload is Structured Streaming.
    """
    cpus = default_parallelism()
    driver_mem = _default_driver_mem()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Machine-derived heap: see _default_driver_mem. Spark's 1g
        # default starves 32 threads long before the machine does
        # (measured: 10x-documents hash aggregate fails to grow its
        # BytesToBytesMap at 1g while 120+ GiB sit idle), and the r10
        # fixed 12g left long sessions GC-bound.
        .config("spark.driver.memory", driver_mem)
        # Heap commit churn is a measured 5x wall-clock hazard here:
        # see _driver_java_opts.
        .config("spark.driver.extraJavaOptions", _driver_java_opts(driver_mem))
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime bloom-filter pushdown: joins inject a bloom built from
        # the small side into the big side's scan (semi-join reduction
        # before the shuffle) — pinned on explicitly because it is a core
        # 100 TB lever even though current Spark defaults it on.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        # Arrow for any pandas_udf / toPandas path (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Explicit Arrow batch-size baseline (Spark's own default). Media
        # operators may LOWER this session-wide for wide binary rows
        # (operators/multimodal.py::_cap_arrow_batch) — monotone by
        # contract, because the conf is read at execution time and a
        # set-then-restore around a lazy plan would undo itself.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
    )
    if streaming:
        for k, v in STREAMING_CONF.items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

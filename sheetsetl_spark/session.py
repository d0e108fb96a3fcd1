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
    """Size the local-mode JVM heap from the ACTIVE PARALLELISM, small.

    In local mode the driver JVM IS the executor: its heap backs every
    task's shuffle/aggregate memory across all N threads, plus cached /
    localCheckpoint blocks, so the heap should track the thread count —
    12g at <=24 threads, 16g at 32 (~0.5 GB/thread), never the machine.

    r12 revert of the r11 machine-derived sizing (3/8 of RAM -> 47g on
    the 128 GiB sandbox): the driver's ground truth condemned it — the
    42-query bench read 148.6 s at local[32]/47g vs 55.4 s for the SAME
    code at 8 cores (BENCH_r11 vs BENCH_r11_c8), with the worst-hit
    queries UNTOUCHED that round and 8-core/32-core scaling ratios of
    0.04-0.5 exactly on the memory-heavy set. A fully committed 47 GB
    heap plus 32 task threads plus 32 Arrow/Python workers invites
    host-side reclaim storms on virtualized hosts that deliver pages
    lazily, and medians (the scoring statistic) favored 16g even in the
    r11 same-host A/B (c2b median 5.53 s @16g vs 14.95 s @47g). A small
    heap also leaves most of RAM to the OS page cache that parquet
    re-reads rely on. Env-overridable; on a real cluster this conf
    sizes only the driver and spark.executor.memory carries the
    executors (guide §5)."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    want = min(16, max(12, default_parallelism() // 2))
    # Cap by what the machine can give RIGHT NOW (best-effort: the read
    # is point-in-time, so concurrent session starts can still jointly
    # overcommit, and the 12g floor can exceed a nearly-full machine —
    # the conftest 8g pin is the real fix for test shards). 80% of
    # MemAvailable leaves room for Python, off-heap and the page cache;
    # under contention the session degrades to a smaller heap instead
    # of dying in the gateway handshake (measured: the third 47g shard
    # of the r11 fast gate, JAVA_GATEWAY_EXITED). The floor stays at
    # 12g — below that a 32-thread local session thrashes anyway (r10
    # measurement).
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
    """Opt-in fixed, fully pre-touched heap (``SPARK_GRAFT_HEAP_PIN=1``).

    DEFAULT IS OFF (r12): on virtualized hosts that deliver pages
    lazily, ``Xms = Xmx + AlwaysPreTouch`` does not actually pin
    physical pages — it only raises the standing commitment, and the
    driver's r11 ground truth charged it (together with the 47g heap it
    pre-touched) with a 2.7x whole-bench regression at local[32]
    (148.6 s vs 55.4 s at 8 cores, same code). The r10/driver-proven
    default is the stock on-demand heap.

    The pin remains available because the churn it fixes was real on a
    bare-metal-like host class (r11): G1 commits regions as the working
    set grows and UNCOMMITS them after concurrent cycles; each
    commit/uncommit is an mmap/munmap whose TLB shootdowns stall every
    executor thread (kernel signature: 80-89% system time, 32+ runnable
    threads, ~8k interrupts/s with user CPU idle; c82 median 20.1 s on
    the default heap vs 4.1 s pre-touched, identical code). On such a
    host export ``SPARK_GRAFT_HEAP_PIN=1`` (and size
    ``SPARK_GRAFT_DRIVER_MEM`` deliberately): -Xms sets the floor G1
    may never shrink below; +AlwaysPreTouch commits and zeroes it ONCE
    at session start, outside every timed region."""
    if os.environ.get("SPARK_GRAFT_HEAP_PIN", "") not in ("1", "true", "yes"):
        return ""
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
        # Cores-scaled heap: see _default_driver_mem. Spark's 1g
        # default starves 32 threads long before the machine does
        # (measured: 10x-documents hash aggregate fails to grow its
        # BytesToBytesMap at 1g while 120+ GiB sit idle); the r11
        # machine-derived 47g was a measured 2.7x bench regression.
        .config("spark.driver.memory", driver_mem)
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
    # Opt-in heap pin for bare-metal-class hosts: see _driver_java_opts.
    java_opts = _driver_java_opts(driver_mem)
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    if streaming:
        for k, v in STREAMING_CONF.items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

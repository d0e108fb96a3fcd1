"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly one compact JSON line as the FINAL stdout line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: median_sec, ...}, "runs": 3, "sf": 0.1}

The per-query [min,max] spread and raw per-pass samples go to a side
artifact (bench_detail.json next to this file), NOT the stdout line:
the driver's artifact capture keeps only the tail of stdout, and r7's
line (with spread inlined) grew past that window, so BENCH_r07.json
recorded an empty parse and the round's 0.81x speedup fell out of the
official record (r7 verdict №2). The compact line is kept under ~1800
chars and a guard warns on stderr if headline growth ever threatens
that budget again.

Each query is materialized with a noop sink (full column evaluation on
executors, no driver collect) — the honest distributed cost.

Median-of-3 (r6 verdict item 2): two consecutive rounds burned verdict
time adjudicating single-shot noise (the measured machine-variance band
is ±6%, SCALE.md). Each query runs in three interleaved passes over the
full list — interleaving spreads a transient load spike across queries
instead of concentrating it on one — and the artifact records the
per-query MEDIAN plus the min/max spread, so a round-over-round delta
can be read against the same-round spread before calling it a trend.

Load-aware (r9 verdict №2): BENCH_r09 recorded a phantom +14% because
the final refresh ran during post-test-suite load decay (1-min loadavg
takes ~3 min to fall after a saturating pytest run; every "regressed"
query was back to normal warm-isolated on an idle machine). The bench
now (a) WAITS for the 1-min loadavg to fall below
$SPARK_GRAFT_LOAD_GATE (default 2.0, 0 disables) before opening the
session, bounded by $SPARK_GRAFT_LOAD_WAIT_SEC (default 300), and
(b) records `"load": [before, after]` in the stdout line — `before` is
the honest external-idleness signal; `after` mostly reflects the
bench's own local[32] footprint and is recorded for completeness. If
the wait times out, `"load_flag": true` marks the totals as suspect so
a verdict reader adjudicates against bench_detail's spread instead of
calling a trend.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sheetsetl_spark.queries import QUERIES  # noqa: E402
from sheetsetl_spark.session import build_session  # noqa: E402

HEADLINE = [
    "b21_groupby_agg",  # flagship: scan -> filter -> hash agg (TPC-H Q1)
    "b20_star_join",  # fact-fact shuffle join + broadcast dims (Q5 shape)
    "b13_left_join",  # outer join + agg
    "b16_self_join",  # fact self-join
    "b22_count_distinct",  # distinct aggregation
    "b30_ranking_functions",  # window ranking stack
    "b32_window_frames",  # running/moving frames
    "b41_correlated_subquery",  # decorrelation
    "b50_tumbling_window",  # event-time windows
    "b52_session_window",  # session windows
    "c1_dedup_latest",  # keyed dedup
    "c2b_minhash_lsh",  # MinHash+LSH near-dup pipeline
    "c2e_embedding_neardup",  # embedding-cosine near-dup (LSH-blocked)
    "c3_topk_cosine",  # brute-force vector top-k
    "c3c_topk_cosine_ivf",  # IVF ANN (probed inverted lists)
    "c4e_tfidf_top_terms",  # tf-idf
    "c7_stratified_sample",  # deterministic corpus downsampling
    "c9_sessionize",  # lag+cumsum sessionization
    "x5_asof_join",  # sort-based as-of join
    "x6_range_join",  # bin-bucketed interval join
    "c15_scd2_history",  # SCD2 gaps-and-islands interval build
    "c16_shard_assignment",  # deterministic shuffle-and-shard
    "c17_label_centroids",  # per-group vector centroid aggregate
    "c18_benchmark_decontamination",  # broadcast n-gram eval overlap
    "c19_apply_mix_weights",  # deterministic weighted resampling
    "c20_quality_threshold_filter",  # percentile-cutoff curation
    # r6 breadth (r5 verdict item 8): track a round-5 surface over time.
    # First recorded in BENCH_r06 — cross-round totals before r6 cover
    # the original 26 queries only.
    "c45_duplicated_passages",  # positioned-gram duplicate-passage mining
    # r7 breadth: the new incremental/media dedup tier. First recorded in
    # BENCH_r07 — cross-round totals before r7 cover the prior 27 only.
    "c49_incremental_embedding_neardup",  # stored-band-index ingest filter
    "c50_image_neardup",  # dHash + exact banded Hamming blocking
    "c52_audio_neardup",  # PCM windowed-energy fingerprint dedup
    "c53_hybrid_rrf_search",  # BM25 + dense-cosine RRF fusion
    "c55_topk_cosine_pq",  # PQ ADC shortlist + exact re-rank
    # r7 batch-4/5 breadth: iterative tokenizer training + exact
    # sub-quadratic similarity join. First recorded in BENCH_r07.
    "c69_bpe_train_apply",  # 5-round distributed BPE learn+apply
    "c72_prefix_filter_jaccard",  # PPJoin-family exact Jaccard join
    # r7 batch-7/8 breadth: global-order statistics via distributed
    # prefix sums + the O(n*k) clustering-quality score. First recorded
    # in BENCH_r07.
    "x86_auc_rank",  # exact ROC AUC (prefix-sum rank statistic)
    "x93_silhouette_centroid",  # centroid silhouette over embeddings
    # r7 batch-11 breadth: exact edit-distance similarity join. First
    # recorded in BENCH_r07.
    "c82_edit_distance_join",  # Ed-Join positional q-gram prefix+count filters
    # r8 breadth: prefix-sum Lorenz deciles + preference-pair windows.
    # First recorded in BENCH_r08.
    "x98_lorenz_deciles",  # global-rank spend concentration
    "c98_preference_pairs",  # per-stratum paired window extrema
    # r8 batch-15: wedge-join link prediction. First recorded in
    # BENCH_r08.
    "c99_adamic_adar",  # Adamic-Adar over co-purchase wedges
    # r8 batch-15/18: ordered sequential recurrence + conformal eval.
    # First recorded in BENCH_r08.
    "c100_holt_linear",  # [level, trend] fold over the daily series
    "c103_conformal_coverage",  # exact order-statistic q_hat + coverage
]


def _wait_for_idle() -> tuple[float, bool]:
    """Block until the 1-min loadavg falls below the gate (or the wait
    budget runs out). Returns (loadavg at release, timed-out flag).

    Gate default tightened 2.0 -> 0.75 (r10 verdict №7): the r10 driver
    run released at loadavg 1.72 — under the old gate — and still read
    +17% vs the idle rerun, so "under 2" demonstrably is NOT inside the
    ±6% idle band on this machine. 0.75 is ~2% of the 32 cores;
    post-test-suite load decays there in ~1-3 min (1-min loadavg
    e-folds per minute), well inside the doubled wait budget."""
    gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "0.75"))
    budget = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "600"))
    load = os.getloadavg()[0]
    if gate <= 0:
        return load, False
    waited = 0.0
    while load > gate and waited < budget:
        print(
            f"bench: loadavg {load:.2f} > gate {gate} — waiting for idle "
            f"({waited:.0f}/{budget:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(10)
        waited += 10
        load = os.getloadavg()[0]
    return load, load > gate


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    load_before, load_flag = _wait_for_idle()

    spark = build_session(app_name="sheetsetl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up each plan's analysis/codegen at the smallest SF so the timed
    # region measures steady-state throughput at the bench SF, not JIT and
    # first-call Catalyst costs (which amortize away in production).
    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for name in HEADLINE:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warmup must never fail the bench

    # Warm the bench-SF table scans too (file listing, parquet footers, OS
    # page cache): the timed region should measure operator throughput at
    # steady state, not whichever queries happen to touch each table first
    # — that first-touch I/O varies with machine state run to run and
    # polluted cross-round comparisons.
    from sheetsetl_spark.catalog import TABLES, load_table

    for table in TABLES:
        try:
            load_table(spark, sf_dir, table).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    # One UNTIMED full pass at the bench SF (r11). The sf0.001 warmup
    # covers analysis/codegen but touches almost no heap; the FIRST
    # full-scale pass of each query then pays the session's cold-memory
    # costs — JIT at real batch sizes, shuffle-dir creation, and (on
    # VM-class hosts where the hypervisor hands out pages lazily even
    # under -XX:+AlwaysPreTouch) the first-fault storm of the working
    # set. Measured on such a host: pass-1 spikes of 22-63s on 2-4s
    # queries (c50 32.2s, c52 22.7s, c55 62.8s) with passes 2-4 steady —
    # a machine artifact, not operator cost, that previously landed
    # inside the timed medians. The timed region is unchanged (3 cold
    # passes, cache cleared per pass, computed from parquet); only the
    # session steady-state the guide's §1 methodology assumes is now
    # actually established before timing starts.
    spark.catalog.clearCache()
    for name in HEADLINE:
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        gc.collect()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(runs):
        # Operators that persist intermediates (c2b shingles, c2e
        # signatures) key the cache on the canonicalized plan: without
        # this, pass 2+ would time a cache READ, not the operator, and
        # medians would stop being comparable with the r1-r6 single-shot
        # record. Each pass starts cold, exactly like the old bench.
        spark.catalog.clearCache()
        for name in HEADLINE:
            start = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - start, 3))
            # Checkpoint hygiene (r9 verdict №8): operators that pin
            # multi-consumer frames via localCheckpoint leave checkpoint
            # RDD blocks alive until the Python DataFrame is collected
            # and the async ContextCleaner runs; across 42 queries x 3
            # passes the lingering blocks were the suspected noise mode
            # behind x98's loaded-session spread. Dropping the Python
            # refs here (outside the timed region) lets the cleaner
            # release them before the next query is timed.
            gc.collect()

    timings = {
        name: round(statistics.median(vals), 3) for name, vals in samples.items()
    }
    spread = {
        name: [round(min(vals), 3), round(max(vals), 3)]
        for name, vals in samples.items()
    }
    total = round(sum(timings.values()), 3)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    load_after = os.getloadavg()[0]
    try:
        with open(detail_path, "w") as f:
            json.dump(
                {
                    "spread": spread,
                    "samples": samples,
                    "runs": runs,
                    "sf": sf,
                    "warm_pass": True,
                    "load": [round(load_before, 2), round(load_after, 2)],
                    "load_flag": load_flag,
                },
                f,
                indent=1,
            )
    except OSError as exc:  # side artifact is best-effort
        print(f"bench: could not write {detail_path}: {exc}", file=sys.stderr)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf": sf,
        # methodology marker (ADVICE r11): one UNTIMED full-SF pass runs
        # before the timed region since r11 — cross-round median deltas
        # vs pre-r11 records must be adjudicated against this flag
        "warm_pass": True,
        # external-load record (r9 verdict №2): `before` is sampled at
        # idle-gate release, `after` includes the bench's own footprint
        "load": [round(load_before, 2), round(load_after, 2)],
    }
    if load_flag:
        payload["load_flag"] = True  # idle wait timed out: totals suspect
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1800:
        print(
            f"bench: WARNING stdout line is {len(line)} chars (>1800); "
            "the driver tail-capture may truncate it — trim HEADLINE or "
            "shorten names",
            file=sys.stderr,
        )
    spark.stop()
    # FINAL stdout line — nothing may print to stdout after this.
    print(line)


if __name__ == "__main__":
    main()

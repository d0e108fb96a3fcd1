"""Unit tests for batch-5: prefix-filter Jaccard join, attribution,
Wilson bound, Kaplan-Meier, CUSUM, histogram quantiles."""

from __future__ import annotations

import pytest

import datetime as dt
import math

from pyspark.sql import functions as F

from sheetsetl_spark.operators.dedup import prefix_filter_jaccard_pairs


def _r6(v):
    return math.floor(v * 1e6 + 0.5) / 1e6


def test_prefix_filter_finds_known_pair_and_prunes(spark):
    # docs 1/2 share most 3-gram shingles; doc 3 is unrelated
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g z"),
        (3, "p q r s t u v w"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = prefix_filter_jaccard_pairs(df, threshold=0.5, n=3).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert set(pairs) == {(1, 2)}
    # shingle sets: doc1/doc2 share 'a b c'..'e f g' (5 of 6 each)
    r = pairs[(1, 2)]
    assert r.inter == 5
    assert r.jaccard == _r6(5 / (6 + 6 - 5))


def test_prefix_filter_exactness_vs_bruteforce(spark):
    # random-ish small corpus: prefix-filtered result must equal the
    # brute-force all-pairs Jaccard at the same threshold
    rows = [
        (i, " ".join(f"w{(i * 7 + k * (1 + i % 3)) % 23}" for k in range(12)))
        for i in range(14)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(df, threshold=0.4, n=2).collect()
    }
    # brute force in python
    def shset(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    sets = {i: shset(t) for i, t in rows}
    want = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                j = inter / (len(sets[a]) + len(sets[b]) - inter)
                if j >= 0.4:
                    want[(a, b)] = _r6(j)
    assert got == want


def test_wilson_orders_small_samples_below_large(spark, tmp_path):
    # 2/2 returns must rank BELOW 48/50 returns on the lower bound
    def wilson(s, n):
        z2, z = 3.8416, 1.96
        p = s / n
        return (p + z2 / (2 * n) - z * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n)) / (
            1 + z2 / n
        )

    assert wilson(2, 2) < wilson(48, 50)


def test_kaplan_meier_hand_case(spark, tmp_path):
    # 4 users: durations 0,0,1 observed; one censored at horizon
    # users: a (day1 only, dur 0), b (day1 only, dur 0),
    #        c (day1-2, dur 1), d (day1-10 = horizon, censored)
    rows = []
    eid = 0

    def ev(u, day):
        nonlocal eid
        eid += 1
        return (eid, dt.datetime(2024, 1, day, 12), u, "view", 1.0, "{}")

    rows += [ev(1, 1)]
    rows += [ev(2, 1)]
    rows += [ev(3, 1), ev(3, 2)]
    rows += [ev(4, 1), ev(4, 10)]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from sheetsetl_spark.queries import QUERIES

    out = {
        r.duration_hours: r
        for r in QUERIES["x82_kaplan_meier"](spark, str(tmp_path)).collect()
    }
    # hour durations: u1=0 obs, u2=0 obs, u3=24h obs, u4=216h censored
    # (last_ts == horizon >= max - 12h). dur 0: at_risk 4, events 2
    # -> S = 0.5; dur 24: at_risk 2, events 1 -> S = 0.25;
    # dur 216 censored-only: no step
    assert set(out) == {0, 24}
    assert out[0].at_risk == 4 and out[0].n_events == 2
    assert abs(out[0].survival - 0.5) < 1e-6
    assert out[24].at_risk == 2 and out[24].n_events == 1
    assert abs(out[24].survival - 0.25) < 1e-6


def test_cusum_returns_to_zero(spark, tmp_path):
    # residuals sum to ~0 by construction: final cusum ~ 0
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 12), 1, "view", float(v), "{}")
        for i, v in enumerate([10, 10, 30, 30])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from sheetsetl_spark.queries import QUERIES

    out = sorted(
        QUERIES["x83_cusum_changepoint"](spark, str(tmp_path)).collect(),
        key=lambda r: r.day,
    )
    assert [r.cusum for r in out] == [-10.0, -20.0, -10.0, 0.0]


def test_histogram_quantiles_close_to_exact(spark):
    from sheetsetl_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    est = {
        r.quantile: r.estimate
        for r in QUERIES["x84_histogram_quantiles"](spark, sf).collect()
    }
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    exact = li.agg(
        F.expr(
            "percentile(l_extendedprice, array(0.5, 0.95, 0.99))"
        ).alias("p")
    ).collect()[0].p
    lo, hi = (
        li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).collect()[0]
    )
    span = float(hi) - float(lo)
    # 100-bin sketch: estimate within ~2 bins of the exact quantile
    for q, ex in zip((0.5, 0.95, 0.99), exact):
        assert abs(est[q] - float(ex)) < span * 0.02, (q, est[q], ex)


def test_last_touch_attribution_hand_case(spark, tmp_path):
    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 1, "ad_click", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 10), 1, "purchase", 5.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 11), 1, "email", 0.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 12), 1, "purchase", 7.0, "{}"),
        (5, dt.datetime(2024, 1, 1, 8), 2, "purchase", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from sheetsetl_spark.queries import QUERIES

    out = {
        r.touch: (r.n_purchases, r.attributed_value)
        for r in QUERIES["x80_last_touch_attribution"](spark, str(tmp_path)).collect()
    }
    assert out["ad_click"] == (1, 5.0)
    assert out["email"] == (1, 7.0)
    assert out["(none)"] == (1, 3.0)


@pytest.mark.slow  # randomized/corpus sweep - full-suite re-verification
def test_prefix_filter_positional_filter_completeness_sweep(spark):
    # the r7 positional filter prunes candidates via
    # overlap <= s + min(n_a - max_ia, n_b - max_ib); sweep thresholds
    # (including ones where the bound sits exactly at the requirement)
    # against python brute force to certify the epsilon guard never
    # drops a qualifying pair
    import itertools

    rows = [
        (i, " ".join(f"t{(i * 5 + k * (1 + i % 4)) % 19}" for k in range(10)))
        for i in range(12)
    ] + [
        (100, "x0 x1 x2 x3 x4 x5 x6 x7"),
        (101, "x0 x1 x2 x3 x4 x5 x6 y9"),  # near-dup of 100
        (102, "x0 x1 x2 x3 z4 z5 z6 z7"),  # half-overlap of 100
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def shset(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    sets = {i: shset(t) for i, t in rows}
    for thr in (0.3, 0.5, 2 / 3, 0.75, 0.9):
        got = {
            (r.doc_a, r.doc_b): (r.inter, r.jaccard)
            for r in prefix_filter_jaccard_pairs(
                df, threshold=thr, n=2
            ).collect()
        }
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= thr:
                want[(a, b)] = (inter, _r6(inter / union))
        assert got == want, (thr, got, want)

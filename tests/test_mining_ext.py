"""Unit tests for the batch-4 mining operators: triangle counting,
assortativity, the BPE trainer, bigram LM, Zipf fit, rolling WAU."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sheetsetl_spark.operators import graph, text


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_triangle_count_k4(spark):
    # complete graph K4: 6 edges, 4 triangles, 12 wedges, clustering 1.0
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    row = graph.triangle_stats(_edges(spark, pairs)).collect()[0]
    assert row.n_nodes == 4
    assert row.n_edges == 6
    assert row.n_wedges == 12
    assert row.n_triangles == 4
    assert row.global_clustering == 1.0


def test_triangle_count_path_has_none(spark):
    row = graph.triangle_stats(_edges(spark, [(1, 2), (2, 3), (3, 4)])).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 2


def test_triangle_count_dedups_and_canonicalizes(spark):
    # duplicate + reversed + self-loop edges collapse to one triangle
    pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)]
    row = graph.triangle_stats(_edges(spark, pairs)).collect()[0]
    assert row.n_edges == 3
    assert row.n_triangles == 1


def test_assortativity_star_is_minus_one(spark):
    # star: every edge joins the hub (deg 3) to a leaf (deg 1) -> -1
    row = graph.degree_assortativity(
        _edges(spark, [(0, 1), (0, 2), (0, 3)])
    ).collect()[0]
    assert row.n_edge_ends == 6
    assert row.assortativity == -1.0


def _bpe_reference(texts, rounds, max_chars):
    """Pure-Python BPE twin: greedy argmax merge per round, overlapping
    pair counts, non-overlapping left-to-right replace."""
    import re

    docs = []
    for t in texts:
        c = re.sub(r"[^a-z ]", "", t.lower())
        c = re.sub(r" +", " ", c).strip()[:max_chars].replace(" ", "_")
        if len(c) >= 2:
            docs.append(list(c))
    for _ in range(rounds):
        counts = {}
        for toks in docs:
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = counts.get((toks[i], toks[i + 1]), 0) + 1
        if not counts:
            break
        (x, y), _n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for d, toks in enumerate(docs):
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            docs[d] = out
    return [" ".join(toks) for toks in docs]


def test_bpe_matches_python_reference(spark):
    texts = [
        "the theme of the thesis",
        "a banana and an anagram",
        "Mixed CASE text, with 42 numbers!",
        "zz",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r.id: r.toks
        for r in text.bpe_train_apply(df, rounds=4, max_chars=50).collect()
    }
    want = _bpe_reference(texts, rounds=4, max_chars=50)
    # every doc survives the len>=2 filter here, so ids map 1:1 in order
    assert len(want) == len(texts)
    assert [got[i] for i in range(len(texts))] == want


def test_bpe_merges_most_frequent_pair_first(spark):
    # 'ab' appears 3x -> first merge must be (a, b)
    df = spark.createDataFrame(
        [(1, "abab ab")], "doc_id bigint, text string"
    )
    out = text.bpe_train_apply(df, rounds=1, max_chars=50).collect()[0]
    # cleaned: 'abab_ab' -> chars; pair (a,b) count 3 beats (b,a)=1 etc.
    assert out.toks == "ab ab _ ab"
    assert out.n_tokens == 4


def test_bpe_no_cross_token_false_match(spark):
    # after merging (t,h)->th, a later (h,e) merge must NOT fire inside
    # 'th e' even though the raw string contains 'h e'
    df = spark.createDataFrame(
        [(1, "the the he he")], "doc_id bigint, text string"
    )
    out = text.bpe_train_apply(df, rounds=2, max_chars=50).collect()[0]
    # round 1: 'he' x4 is argmax (h,e); round 2 merges differ — just
    # assert token count decreased and tokens are space-consistent
    assert "  " not in out.toks
    assert out.n_tokens == len(out.toks.split(" "))


def test_bigram_logprob_hand_case(spark):
    # corpus: one doc 'a b a b' -> bigrams (a,b)x2, (b,a)x1; V=2
    df = spark.createDataFrame([(1, "a b a b")], "doc_id bigint, text string")
    row = text.bigram_logprob(df).collect()[0]
    assert row.n_bigrams == 3
    # c(a)=2, c(b)=2, V=2; p(ab)=(2+1)/(2+2)=.75 (x2), p(ba)=(1+1)/(2+2)=.5
    def r6(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    want = r6((2 * r6(-math.log(0.75)) + 1 * r6(-math.log(0.5))) / 3)
    assert abs(row.avg_bigram_surprise - want) < 1e-9


def test_zipf_slope_exact_formula(spark):
    df = spark.createDataFrame(
        [(1, "a a a a b b c")], "doc_id bigint, text string"
    )
    row = text.zipf_slope(df, top=3).collect()[0]
    assert row.n_terms == 3

    def r6(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    xs = [r6(math.log(r)) for r in (1, 2, 3)]
    ys = [r6(math.log(c)) for c in (4, 2, 1)]
    n = 3.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(r6(x * y) for x, y in zip(xs, ys))
    sxx = sum(r6(x * x) for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row.zipf_slope - r6(slope)) < 1e-9
    assert row.zipf_slope < 0


def test_rolling_wau_window_semantics(spark, tmp_path):
    # build a tiny events parquet: user 1 active day 1, user 2 day 9 —
    # windows ending days 1..7 see user 1; 9..15 see user 2; day 8 none
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 9, 10), 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from sheetsetl_spark.queries import QUERIES

    out = {
        r.day: r.wau_7d
        for r in QUERIES["x78_rolling_wau"](spark, str(tmp_path)).collect()
    }
    assert out["2024-01-01"] == 1
    assert out["2024-01-07"] == 1
    assert out["2024-01-08"] == 0
    assert out["2024-01-09"] == 1
    assert len(out) == 9  # spine is min..max day


def test_kcore_peels_cascade(spark):
    # path a-b-c-d plus triangle e-f-g: 2-core keeps only the triangle
    # (path endpoints peel, then the whole path cascades away)
    edges = _edges(
        spark, [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7)]
    )
    out = {r.node: r.deg for r in graph.kcore(edges, k=2, rounds=4).collect()}
    assert out == {5: 2, 6: 2, 7: 2}


def test_kcore_converged_is_stable(spark):
    # K4 is its own 3-core; extra rounds are no-ops
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    out3 = {r.node: r.deg for r in graph.kcore(_edges(spark, pairs), k=3, rounds=2).collect()}
    out6 = {r.node: r.deg for r in graph.kcore(_edges(spark, pairs), k=3, rounds=6).collect()}
    assert out3 == out6 == {0: 3, 1: 3, 2: 3, 3: 3}


def test_knn_label_entropy_pure_and_mixed(spark):
    from sheetsetl_spark.queries import QUERIES

    rows = QUERIES["c73_knn_label_entropy"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 8
    for r in rows:
        # entropy bounds: 0 (pure) .. ln(10); share consistent
        assert 0.0 <= r.entropy <= math.log(10) + 1e-9
        assert 0.1 <= r.top_share <= 1.0
        if r.n_labels == 1:
            assert r.entropy == 0.0 and r.top_share == 1.0

"""Unit tests for batch-11: exact edit-distance join (Ed-Join filters),
retrieval eval metrics, substring decontamination (broadcast + anchored
paths), sorted-neighborhood blocking, group overlap matrix."""

from __future__ import annotations

import pytest

from sheetsetl_spark.operators.dedup import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, k):
    out = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            d = _lev(ta, tb)
            if d <= k:
                a, b = sorted((ia, ib))
                out[(a, b)] = d
    return out


def test_edit_distance_finds_small_edits_and_prunes(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cog"),  # 1 sub
        (3, "a completely different sentence with nothing shared"),
        (4, "the quick brown fox leaps over the lazy dog"),  # vs 1: 3 edits
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.doc_a, r.doc_b): r.dist for r in edit_distance_pairs(df, k=4).collect()}
    assert got == _brute(rows, 4)
    assert got[(1, 2)] == 1


def test_edit_distance_multiset_grams_complete(spark):
    """Repetitive text is the multiset trap: with SET grams, 'batch
    batch batch batch' and its one-edit variant share almost no distinct
    information and a set-based count filter would over-prune. The
    occurrence-numbered encoding must keep every qualifying pair."""
    rows = [
        (1, "batch batch batch batch batch batch"),
        (2, "batch batch batch batch batch batcx"),  # 1 sub at the tail
        (3, "batch batch batch batch batch"),  # 6 deletions from doc 1
        (4, "stream stream stream stream stream!"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.doc_a, r.doc_b): r.dist for r in edit_distance_pairs(df, k=6).collect()}
    assert got == _brute(rows, 6)
    assert (1, 2) in got and (1, 3) in got


@pytest.mark.slow  # randomized/corpus sweep - full-suite re-verification
def test_edit_distance_exactness_sweep_vs_bruteforce(spark):
    """Pseudo-random corpus, k sweep: the filtered join must equal the
    brute-force DP at every threshold (completeness + no false pairs)."""
    rows = []
    for i in range(16):
        chars = [chr(97 + (i * 11 + j * (2 + i % 5)) % 26) for j in range(30)]
        for p in range(i % 4):  # sprinkle edits among neighbors
            chars[(p * 7) % 30] = chr(97 + (i + p) % 26)
        rows.append((i, "".join(chars)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for k in (1, 2, 4, 7):
        got = {
            (r.doc_a, r.doc_b): r.dist
            for r in edit_distance_pairs(df, k=k).collect()
        }
        assert got == _brute(rows, k), f"k={k}"


def test_edit_distance_short_strings_excluded(spark):
    """Strings shorter than q have no grams and are excluded by
    contract (documented in the operator docstring)."""
    rows = [(1, "ab"), (2, "ab"), (3, "abcdef"), (4, "abcdxf")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.doc_a, r.doc_b): r.dist for r in edit_distance_pairs(df, k=2).collect()}
    assert got == {(3, 4): 1}


def test_ranking_metrics_known_values(spark):
    from sheetsetl_spark.operators.retrieval import ranking_metrics

    ranked = spark.createDataFrame(
        [
            # q1: relevant at ranks 2 and 3 (of 4 relevant in corpus)
            (1, 10, 1), (1, 11, 2), (1, 12, 3),
            # q2: nothing relevant in the pool
            (2, 10, 1), (2, 11, 2), (2, 12, 3),
        ],
        "query_id bigint, neighbor_id bigint, nn_rank int",
    )
    rel = spark.createDataFrame(
        [(1, 11, 4), (1, 12, 4), (1, 77, 4), (1, 78, 4), (2, 99, 1)],
        "query_id bigint, neighbor_id bigint, n_relevant int",
    )
    got = {r.query_id: r for r in ranking_metrics(ranked, rel, k=3).collect()}
    assert got[1].rr == 0.5
    assert got[1].hits_at_k == 2
    assert got[1].precision_at_k == round(2 / 3, 6)
    assert got[1].recall_at_k == 0.5
    assert got[2].rr == 0.0
    assert got[2].hits_at_k == 0
    assert got[2].recall_at_k == 0.0
    # nDCG@3 for q1: relevant at ranks 2,3; ideal = ranks 1,2,3
    # (n_relevant=4 > k). Terms rounded to 12 like the operator.
    import math

    g = lambda r: round(1.0 / math.log2(r + 1.0), 12)
    assert got[1].ndcg_at_k == round((g(2) + g(3)) / (g(1) + g(2) + g(3)), 6)
    assert got[2].ndcg_at_k == 0.0

    # Duplicate judgments (two assessors marked (1,11)) must not fan
    # the ranked rows out and double-count hits/precision/recall/DCG.
    rel_dup = rel.unionByName(
        spark.createDataFrame(
            [(1, 11, 4)], "query_id bigint, neighbor_id bigint, n_relevant int"
        )
    )
    got_dup = {
        r.query_id: r for r in ranking_metrics(ranked, rel_dup, k=3).collect()
    }
    assert got_dup[1] == got[1] and got_dup[2] == got[2]


def test_substring_decontaminate_hits_and_misses(spark):
    from sheetsetl_spark.operators.dedup import substring_decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "the launch codes are zebra tango nine"),
            (2, "nothing to see here"),
            (3, "prefix zebra tango nine suffix and more"),
        ],
        "doc_id bigint, text string",
    )
    probes = spark.createDataFrame(
        [(100, "zebra tango nine"), (200, "see here")],
        "probe_id bigint, probe string",
    )
    got = {
        r.doc_id: (r.n_probes_hit, r.probe_ids)
        for r in substring_decontaminate(corpus, probes).collect()
    }
    assert got == {1: (1, "100"), 2: (1, "200"), 3: (1, "100")}


def test_substring_decontaminate_multi_probe_doc(spark):
    from sheetsetl_spark.operators.dedup import substring_decontaminate

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id bigint, text string"
    )
    probes = spark.createDataFrame(
        [(12, "beta gamma"), (2, "alpha"), (30, "zzz")],
        "probe_id bigint, probe string",
    )
    [row] = substring_decontaminate(corpus, probes).collect()
    assert row.n_probes_hit == 2
    assert row.probe_ids == "2,12"  # numeric sort, not lexicographic


def test_sorted_neighborhood_exact_pairs(spark):
    from sheetsetl_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "apple"), (2, "apply"), (3, "banana"), (4, "cherry")],
        "k bigint, name string",
    )
    got = {
        (r.k_a, r.k_b, r.gap)
        for r in sorted_neighborhood_pairs(
            df, ["name", "k"], window=3, payload_cols=["k"]
        ).collect()
    }
    # sort order: apple(1) apply(2) banana(3) cherry(4); w=3 -> gaps 1..2
    assert got == {(1, 2, 1), (1, 3, 2), (2, 3, 1), (2, 4, 2), (3, 4, 1)}


def test_group_overlap_matrix_exact_jaccard(spark):
    from sheetsetl_spark.operators.profiling import group_overlap_matrix

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),      # shingles: "a b c", "b c d"
            (2, "a b c x", "s2"),      # shingles: "a b c", "b c x"
            (3, "p q r s", "s3"),      # disjoint
        ],
        "doc_id bigint, text string, source string",
    )
    rows = group_overlap_matrix(docs, n=3, group_col="source").collect()
    assert len(rows) == 1
    [r] = rows
    assert (r.group_a, r.group_b, r.inter, r.union_sz) == ("s1", "s2", 1, 3)
    assert r.jaccard == round(1 / 3, 6)


def test_anchored_decontamination_matches_broadcast_variant(spark):
    """On probes with >= 2 interior words the anchored equi-join path
    must produce EXACTLY the broadcast path's answer."""
    from sheetsetl_spark.operators.dedup import (
        substring_decontaminate,
        substring_decontaminate_anchored,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "zeta epsilon delta gamma beta alpha"),
            (3, "beta gamma delta elsewhere entirely now"),
            (4, "nothing shared at all here friend"),
        ],
        "doc_id bigint, text string",
    )
    # probe cut mid-word on both edges: interior words beta gamma delta
    probes = spark.createDataFrame(
        [(7, "ha beta gamma delta ep")], "probe_id bigint, probe string"
    )
    a = {
        (r.doc_id, r.n_probes_hit, r.probe_ids)
        for r in substring_decontaminate(corpus, probes).collect()
    }
    b = {
        (r.doc_id, r.n_probes_hit, r.probe_ids)
        for r in substring_decontaminate_anchored(corpus, probes).collect()
    }
    assert a == b == {(1, 1, "7")}


def test_anchored_decontamination_drops_short_probes(spark):
    from sheetsetl_spark.operators.dedup import substring_decontaminate_anchored

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id bigint, text string"
    )
    probes = spark.createDataFrame(
        [(7, "alpha beta")], "probe_id bigint, probe string"  # < 4 words
    )
    assert substring_decontaminate_anchored(corpus, probes).count() == 0


def test_quantile_normalize_known_mapping(spark):
    from sheetsetl_spark.operators.profiling import quantile_normalize

    # group a: values 10,20 (n=2); group b: 30,40,50,60 (n=4); N=6
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40),
         (5, "b", 50), (6, "b", 60)],
        "id bigint, g string, v bigint",
    )
    got = {
        r.id: r.norm_value
        for r in quantile_normalize(df, "g", "v", "id").collect()
    }
    # global sorted: 10,20,30,40,50,60
    # a: r=1 -> ceil(1*6/2)=3 -> 30 ; r=2 -> ceil(12/2)=6 -> 60
    # b: r=1 -> ceil(6/4)=2 -> 20 ; r=2 -> 3 -> 30 ; r=3 -> ceil(4.5)=5
    #    -> 50 ; r=4 -> 6 -> 60
    assert got == {1: 30, 2: 60, 3: 20, 4: 30, 5: 50, 6: 60}


def test_quantile_normalize_idempotent_single_group(spark):
    """One group: the mapping must be the identity (rank r of n maps to
    global rank r of N=n)."""
    from sheetsetl_spark.operators.profiling import quantile_normalize

    df = spark.createDataFrame(
        [(i, "only", i * 7 % 13) for i in range(13)], "id bigint, g string, v bigint"
    )
    rows = quantile_normalize(df, "g", "v", "id").collect()
    assert all(r.v == r.norm_value for r in rows) and len(rows) == 13


def test_ewma_by_key_sequential_fold(spark):
    from sheetsetl_spark.operators.incremental import ewma_by_key

    df = spark.createDataFrame(
        [("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 40.0),
         ("j", 9, 8.0)],
        "key string, day int, x double",
    )
    got = {r.key: (r.n_points, r.ewma) for r in
           ewma_by_key(df, "key", "day", "x", alpha=0.5).collect()}
    # k: s1=5, s2=12.5, s3=26.25 ; j: 4.0
    assert got == {"k": (3, 26.25), "j": (1, 4.0)}


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe candidates are a strict superset of single-probe
    candidates, so recall@k must dominate row-by-row — measured on the
    sf0.001 fixture."""
    from tests.conftest import SF_SMALL
    from sheetsetl_spark.queries import QUERIES

    rows = QUERIES["c91_multiprobe_recall"](spark, SF_SMALL).collect()
    by = {(r.method, r.query_id): r.recall_at_k for r in rows}
    qids = {q for m, q in by if m == "lsh"}
    assert qids  # non-empty harness
    for qid in qids:
        assert by[("lsh_multiprobe", qid)] >= by[("lsh", qid)], qid
    # and the probe set actually buys something on this fixture
    assert sum(by[("lsh_multiprobe", q)] for q in qids) >= sum(
        by[("lsh", q)] for q in qids
    )


def test_word_dropout_deterministic_and_subsequence(spark):
    from sheetsetl_spark.operators.text import word_dropout

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id bigint, text string",
    )
    a = word_dropout(docs).collect()[0]
    b = word_dropout(docs.repartition(7)).collect()[0]
    assert a == b  # partition-invariant
    assert a.n_kept <= a.n_orig == 10
    # kept tokens are a subsequence of the original
    orig = "the quick brown fox jumps over the lazy dog today".split()
    kept = a.aug_text.split()
    it = iter(orig)
    assert all(tok in it for tok in kept)


def test_span_corruption_roundtrip_reconstructs(spark):
    """Splicing each target span back over its sentinel must reproduce
    the original text exactly — the property that makes the (corrupted,
    target) pair trainable."""
    from sheetsetl_spark.operators.text import span_corruption

    text = " ".join(f"w{i:02d}" for i in range(40))
    docs = spark.createDataFrame([(5, text)], "doc_id bigint, text string")
    row = span_corruption(docs).collect()[0]
    if row.n_spans == 0:
        raise AssertionError("fixture produced no spans; change doc_id")
    # parse target: "<extra_id_0> t t t <extra_id_1> t ..." -> spans
    spans = {}
    cur = None
    for tok in row.target.split():
        if tok.startswith("<extra_id_"):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    rebuilt = []
    for tok in row.corrupted.split():
        rebuilt.extend(spans[tok] if tok in spans else [tok])
    assert " ".join(rebuilt) == text
    assert len(spans) == row.n_spans


def test_quality_canonical_keeps_exactly_one_per_cluster(spark):
    from tests.conftest import SF_SMALL
    from sheetsetl_spark.queries import QUERIES
    from pyspark.sql import functions as F

    df = QUERIES["c94_quality_canonical_dedup"](spark, SF_SMALL)
    per = df.groupBy("cluster_id").agg(
        F.sum("kept").alias("n_kept"),
        F.max(F.when(F.col("kept") == 1, F.col("quality"))).alias("kq"),
        F.max("quality").alias("mq"),
    ).collect()
    assert per  # fixture has seeded near-dup clusters
    for r in per:
        assert r.n_kept == 1, r
        assert r.kq == r.mq, r  # the keeper has the cluster-max quality


def test_token_budget_sample_prefix_property(spark):
    """Kept docs per group are exactly the md5-ordered prefix whose
    running token count fits the budget, and never split a doc."""
    from sheetsetl_spark.operators.layout import token_budget_sample

    docs = spark.createDataFrame(
        [(i, "s" + str(i % 2), " ".join(["w"] * (3 + i % 4))) for i in range(12)],
        "doc_id bigint, source string, text string",
    )
    budget = 10
    rows = token_budget_sample(docs, budget).collect()
    assert rows
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.source, []).append(r)
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: r.cum_tokens)
        cum = 0
        for r in rs:
            cum += r.n_tokens
            assert r.cum_tokens == cum
        assert cum <= budget
    # partition invariance
    again = {
        (r.doc_id, r.cum_tokens)
        for r in token_budget_sample(docs.repartition(5), budget).collect()
    }
    assert again == {(r.doc_id, r.cum_tokens) for r in rows}


def test_kmv_exact_fallback_and_error_band(spark):
    from sheetsetl_spark.operators.profiling import kmv_distinct

    # small group (< k distinct) -> exact fallback; big group -> estimate
    rows = [("small", f"v{i}") for i in range(10)]
    rows += [("big", f"x{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r.g: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    assert got["small"].n_exact == 10
    assert got["small"].n_est == 10.0 and got["small"].rel_err == 0.0
    assert got["big"].n_exact == 3000
    # KMV std error ~ 1/sqrt(k) = 12.5%; 4 sigma band as a sanity fence
    assert got["big"].rel_err < 0.5

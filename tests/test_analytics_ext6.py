"""Unit tests for batch-11: exact edit-distance join (Ed-Join filters),
snapshot diff, one-pass column profiler."""

from __future__ import annotations

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

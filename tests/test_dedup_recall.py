"""Measured recall of the MinHash+LSH near-dup path against the exact
n-gram Jaccard operator on a random synthetic corpus — the text-dedup
analog of the c35 ANN recall harness: not just planted identical twins
(tests/test_operators.py covers those) but a spread of TRUE similarities,
with the banding theory's recall floor checked where it is sharp.

With 32 hashes in 8 bands of 4 rows, P[collide | J] = 1-(1-J^4)^8:
J=0.9 -> 0.9996, J=0.8 -> 0.98 — so candidates must contain essentially
every pair the exact operator emits at threshold 0.8.
"""

from __future__ import annotations

import random

from sheetsetl_spark.cache import cache_scope
from sheetsetl_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

_WORDS = [f"w{i}" for i in range(50)]


def _corpus(n_docs: int = 40, seed: int = 7) -> list[tuple[int, str]]:
    """Base docs plus mutated near-copies covering a range of true
    Jaccard similarities (word replacement at varying rates)."""
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs // 2):
        base = [rng.choice(_WORDS) for _ in range(30)]
        docs.append((2 * i, " ".join(base)))
        mutated = list(base)
        for _ in range(rng.randint(0, 8)):  # 0-8 word edits
            mutated[rng.randrange(len(mutated))] = rng.choice(_WORDS)
        docs.append((2 * i + 1, " ".join(mutated)))
    return docs


def test_lsh_recall_of_exact_pairs(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    with cache_scope():
        exact = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in ngram_jaccard_pairs(df, threshold=0.8).collect()
        }
        lsh = {
            (r.doc_a, r.doc_b)
            for r in minhash_lsh_pairs(df, threshold=0.8).collect()
        }
    assert exact, "corpus must produce some true near-dup pairs"
    # P[miss | J>=0.8] <= 2%; over tens of pairs expect zero-or-one miss
    hits = sum(1 for p in exact if p in lsh)
    recall = hits / len(exact)
    assert recall >= 0.9, (recall, len(exact))
    # and LSH never emits a pair the exact operator rejects: the verify
    # stage recomputes TRUE Jaccard on candidates (precision is exact)
    for p in lsh:
        assert p in exact, (p, "LSH emitted a pair below the exact threshold")


def test_lsh_equals_exact_at_high_threshold(spark):
    """At J >= 0.9 the collision floor is 0.9996 — LSH output must equal
    the exact operator's on a corpus of this size."""
    df = spark.createDataFrame(_corpus(seed=11), "doc_id long, text string")
    with cache_scope():
        exact = {
            (r.doc_a, r.doc_b)
            for r in ngram_jaccard_pairs(df, threshold=0.9).collect()
        }
        lsh = {
            (r.doc_a, r.doc_b)
            for r in minhash_lsh_pairs(df, threshold=0.9).collect()
        }
    assert exact and lsh == exact, (len(exact), len(lsh))

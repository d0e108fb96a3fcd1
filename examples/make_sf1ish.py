"""Generate a ~10x "sf1-ish" fixture for the heavy C-series scale step
(r6 verdict item 6). Writes /tmp/sf1ish/{documents,embeddings}.parquet
(plus copies of the other sf0.1 tables so queries that touch them run).

Construction (why it is an honest 10x, not a degenerate one):

- documents: 10 replicas; replica k rewrites every token through a
  deterministic PERMUTATION of the corpus vocabulary (seeded by k,
  replica 0 = identity). A vocabulary permutation is a Jaccard
  isomorphism, so every planted near-dup pair is preserved exactly
  within each replica (pair count grows linearly, 10x) while replicas
  are not near-dups of each other. The shingle UNIVERSE stays the same
  size (same vocab), so mean shingle document-frequency grows ~10x —
  exactly how boilerplate behaves in a real 10x corpus, which is what
  makes the max_shingle_df cap bind harder at scale.
- embeddings: 10 replicas; replica k rolls each vector's coordinates by
  k positions. A coordinate roll is an isometry applied uniformly, so
  within-replica cosine structure (planted near-dups, cluster shape) is
  preserved exactly; cross-replica similarities are as-random.

doc_id / vec_id are offset per replica to stay unique.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1ISH_DIR", "/tmp/sf1ish")
# 10 = the standard 10x step; SF1ISH_REPLICAS=100 builds the 100x point
# (the vocabulary-permutation / coordinate-roll laws hold at any k).
REPLICAS = int(os.environ.get("SF1ISH_REPLICAS", "10"))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in os.listdir(SRC):
        if name.endswith(".parquet") and name not in (
            "documents.parquet",
            "embeddings.parquet",
        ):
            shutil.copy(os.path.join(SRC, name), os.path.join(DST, name))

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    d = docs.to_pydict()
    vocab = sorted({t for txt in d["text"] for t in txt.split(" ")})
    v_index = {w: i for i, w in enumerate(vocab)}
    n = len(d["doc_id"])
    rng = np.random.default_rng(7)
    out = {k: [] for k in d}
    for k in range(REPLICAS):
        if k == 0:
            perm = np.arange(len(vocab))
        else:
            perm = rng.permutation(len(vocab))
        sub = [vocab[perm[i]] for i in range(len(vocab))]
        for i in range(n):
            text = " ".join(sub[v_index[t]] for t in d["text"][i].split(" "))
            out["doc_id"].append(d["doc_id"][i] + k * n)
            out["text"].append(text)
            out["lang"].append(d["lang"][i])
            out["source"].append(d["source"][i])
            out["n_chars"].append(len(text))
    pq.write_table(pa.table(out, schema=docs.schema), os.path.join(DST, "documents.parquet"))

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    e = emb.to_pydict()
    m = len(e["vec_id"])
    vecs = np.array(e["embedding"], dtype=np.float32)
    eout = {"vec_id": [], "embedding": [], "label": []}
    dim = vecs.shape[1]
    for k in range(REPLICAS):
        rolled = np.roll(vecs, k % dim, axis=1)
        if k >= dim:
            # rolls wrap at dim, so replica k would exactly duplicate
            # replica k-dim's vector set. A per-replica uniform sign
            # pattern is still an isometry (within-replica cosines
            # preserved exactly) but scrambles cross-replica alignment.
            signs = np.random.default_rng(1000 + k).choice(
                np.array([-1.0, 1.0], dtype=np.float32), size=dim
            )
            rolled = rolled * signs
        eout["vec_id"].extend(int(v) + k * m for v in e["vec_id"])
        eout["embedding"].extend(rolled.tolist())
        eout["label"].extend(e["label"])
    pq.write_table(pa.table(eout, schema=emb.schema), os.path.join(DST, "embeddings.parquet"))
    print(f"wrote {DST}: {n * REPLICAS} docs, {m * REPLICAS} vectors")


if __name__ == "__main__":
    main()

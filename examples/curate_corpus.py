"""End-to-end example: assemble a training corpus from raw documents.

The full curation funnel every LLM-data pipeline runs, composed from
sheetsetl_spark.operators — each stage is the operator the query
registry hash-checks (c2*/c4*/c16/c18/c20), wired the way a production
job would wire them:

    raw -> quality filter -> exact dedup -> near-dup removal
        -> benchmark decontamination -> deterministic shards -> parquet

Every stage is deterministic (md5-keyed, decimal-exact), so re-running
on any cluster/partitioning yields byte-identical shards.

    python examples/curate_corpus.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.operators import dedup, text
from sheetsetl_spark.operators.layout import deterministic_shards
from sheetsetl_spark.session import build_session
from sheetsetl_spark.sinks import ParquetDirSink


def curate(spark, sf_dir: str, out_dir: str, n_shards: int = 4) -> dict[str, int]:
    docs = load_table(spark, sf_dir, "documents")
    report = {"raw": docs.count()}

    # 1. quality floor: keep docs scoring >= 0.5 (length band + stopword
    #    presence + lexical diversity) — per-row arithmetic, no shuffle
    quality = text.quality_score(docs)
    keep_ids = quality.filter(F.col("quality") >= 0.5).select("doc_id")
    docs = docs.join(keep_ids, "doc_id", "left_semi")
    report["after_quality"] = docs.count()

    # 2. exact dedup on the normalized-text fingerprint (16-byte shuffle
    #    key, smallest doc_id wins deterministically)
    fp = text.fingerprint(docs).select("doc_id", "fp")
    winners = dedup.exact_dedup(fp, ["fp"], [F.col("doc_id")]).select("doc_id")
    docs = docs.join(winners, "doc_id", "left_semi")
    report["after_exact_dedup"] = docs.count()

    # 3. near-dup removal: MinHash+LSH candidates verified by true
    #    Jaccard; the larger doc_id of each verified pair is dropped
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")
    report["after_near_dedup"] = docs.count()

    # 4. benchmark decontamination: drop any doc sharing a 5-gram with
    #    the (broadcast) eval set — here the fixture's first 20 docs
    evals = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    contaminated = dedup.eval_decontamination(docs, evals).select(
        F.col("train_doc_id").alias("doc_id")
    )
    docs = docs.join(contaminated, "doc_id", "left_anti")
    report["after_decontamination"] = docs.count()

    # 5. reproducible shards: (shard_id, pos) is a pure function of
    #    (doc_id, seed) — the same corpus shards identically anywhere
    sharded = deterministic_shards(docs, "doc_id", n_shards=n_shards, seed=42)
    ParquetDirSink(out_dir, partition_by=["shard_id"]).write(sharded, "corpus")
    report["shards"] = n_shards
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "examples/out"
    spark = build_session(app_name="sheetsetl-curate")
    spark.sparkContext.setLogLevel("ERROR")
    report = curate(spark, sf_dir, out_dir)
    for stage, value in report.items():
        print(f"{stage:>22}: {value}")


if __name__ == "__main__":
    main()

"""10x/100x scale step for the streaming INGEST paths (r9 verdict №6):
the kill-and-restart drill proves recovery; this measures THROUGHPUT.

Replays the 10x (/tmp/sf1ish, 20k vectors) and 100x (/tmp/sf100ish,
200k) embedding corpora through EmbeddingDedupIngestForeachBatch in 4
micro-batches, and a synthesized PPM media corpus of the same ids
through MediaDedupIngestForeachBatch — the foreachBatch callables are
invoked directly (the tested pattern: the streaming engine adds only
scheduling around them), so the walls are the per-batch ingest cost a
Structured Streaming run would pay. Records per-batch walls, total,
and the on-disk state size (history + index parquet) per corpus.

Banding note: the ingest class pins its banding at construction (the
stored index must be self-consistent across batches — mixing widths
would break the band equi-join), so the 100x run sizes it up front
with choose_banding(expected_corpus) instead of the legacy 32/4; this
is exactly the "caller at another scale" path the helper exists for.

Results recorded in SCALE.md ("round-10 ingest throughput" entry).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sheetsetl_spark.catalog import load_table  # noqa: E402
from sheetsetl_spark.operators.dedup import choose_banding  # noqa: E402
from sheetsetl_spark.session import build_session  # noqa: E402

N_BATCHES = 4


def _dir_mb(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total / (1 << 20)


def _replay(label, ingest, batches, dirs):
    walls = []
    for i, b in enumerate(batches):
        t0 = time.perf_counter()
        ingest(b, i)
        walls.append(time.perf_counter() - t0)
        print(f"  {label} batch {i}: {walls[-1]:.1f}s", flush=True)
    state = sum(_dir_mb(d) for d in dirs)
    print(
        f"{label}: total {sum(walls):.1f}s over {len(batches)} batches, "
        f"state {state:.1f} MB",
        flush=True,
    )


def main() -> None:
    from pyspark.sql import functions as F

    from sheetsetl_spark.operators.multimodal import synthesize_ppm_media
    from sheetsetl_spark.streaming import (
        EmbeddingDedupIngestForeachBatch,
        MediaDedupIngestForeachBatch,
    )

    spark = build_session(app_name="scale-step-ingest", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, n_expected in (("/tmp/sf1ish", 20_000), ("/tmp/sf100ish", 200_000)):
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir} (fixture absent; see examples/make_sf1ish.py)")
            continue
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        step = n_expected // N_BATCHES
        batches = [
            emb.filter(
                (F.col("vec_id") >= i * step) & (F.col("vec_id") < (i + 1) * step)
            )
            for i in range(N_BATCHES)
        ]
        print(f"== {sf_dir} ({n_expected} vectors, {N_BATCHES} batches) ==", flush=True)

        work = tempfile.mkdtemp(prefix="ingest_scale_")
        hist, idx = os.path.join(work, "hist"), os.path.join(work, "idx")
        planes, bands = choose_banding(n_expected)
        print(f"embedding ingest banding: {planes} planes / {bands} bands", flush=True)
        _replay(
            "embedding",
            EmbeddingDedupIngestForeachBatch(
                hist, idx, threshold=0.98, num_planes=planes, bands=bands
            ),
            batches,
            [hist, idx],
        )
        shutil.rmtree(work, ignore_errors=True)

        work = tempfile.mkdtemp(prefix="ingest_scale_")
        hist, idx = os.path.join(work, "hist"), os.path.join(work, "idx")
        # HIGH-ENTROPY corpus (r10 verdict №5): the earlier 4x4 gradient
        # formula produced only ~62 distinct dHash classes at 200k ids,
        # so the identical-fingerprint collapse shrank the whole state
        # store to 0.1 MB and the banded index never grew — a vacuous
        # state-scaling measurement. The c50 splitmix mixer at 8x8
        # (56-bit dHash, measured zero natural collisions at 16k docs)
        # makes fingerprints essentially unique per id, so the index
        # grows ~linearly in survivors; a 2% planted same-pixel copy
        # stream (ids +1e7) keeps the drop path exercised.
        from sheetsetl_spark.queries.extensions import _mix

        media_batches = [
            synthesize_ppm_media(
                b, id_col="vec_id", width=8, height=8, pixel_fn=_mix
            ).unionAll(
                synthesize_ppm_media(
                    b.filter(F.col("vec_id") % 100 < 2),
                    id_col="vec_id", width=8, height=8, pixel_fn=_mix,
                    id_offset=10_000_000,
                )
            )
            for b in batches
        ]
        _replay(
            "media",
            MediaDedupIngestForeachBatch(hist, idx, max_hamming=2, bands=4),
            media_batches,
            [hist, idx],
        )
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

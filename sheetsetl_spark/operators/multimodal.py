"""Multimodal column operators (SURVEY §2-C C5): opaque binary payloads
(image/audio/video) with typed metadata, processed via Arrow-batched
mapInPandas.

The Spark-side plumbing here is real and tested: schema contract,
partition sizing, Pandas-UDF batch shape, metadata extraction. The actual
media decoding is STUBBED (this container ships no image/audio libs) —
``decode_fn`` is injectable; the default ``deterministic_fake_decoder``
produces stable pseudo-features from the bytes so tests can assert
end-to-end behavior, and ``strict_decoder`` raises NotImplementedError to
mark the integration point.

Scale notes: media corpora dominate byte volume, so the operators
(a) never collect payloads to the driver, (b) repartition by a size
budget before the UDF stage so one Arrow batch fits executor memory, and
(c) project payload bytes away as soon as features are extracted.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Contract for a multimodal table: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def deterministic_fake_decoder(payload: bytes, kind: str) -> list[float]:
    """Stand-in for image/audio decoding: 8 stable pseudo-features from
    the byte stream (so the distributed plumbing is fully testable)."""
    if payload is None:
        return []
    acc = [0] * 8
    for i, b in enumerate(payload):
        acc[i % 8] = (acc[i % 8] + b) % 997
    return [a / 997.0 for a in acc]


def strict_decoder(payload: bytes, kind: str) -> list[float]:
    """The real-media integration point. Container has no codec libs."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; inject a decode_fn (see deterministic_fake_decoder)"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] = deterministic_fake_decoder,
    target_rows_per_batch: int = 1024,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    The UDF yields narrow feature rows and drops the payload column —
    downstream stages never shuffle raw media bytes.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": [
                        decode_fn(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(target_rows_per_batch))
    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def deterministic_fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Stand-in for image resize: deterministic byte resampling to
    width*height bytes (repeat/truncate) so batch shape and payload flow
    are testable without codec libs."""
    if payload is None:
        return b""
    target = max(1, width * height)
    reps = (target // max(1, len(payload))) + 1
    return (payload * reps)[:target]


def strict_resizer(payload: bytes, width: int, height: int) -> bytes:
    raise NotImplementedError(
        "image resize requires imaging libraries not present in this "
        "environment; inject a resize_fn (see deterministic_fake_resizer)"
    )


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] = deterministic_fake_resizer,
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """Resize the image payloads via mapInPandas (Arrow batches).

    Non-image rows pass through untouched. Batches are kept small
    (``target_rows_per_batch``) because both input and output carry
    payload bytes — the one multimodal stage where width stays wide."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [
                        resize_fn(p, width, height) if k == "image" else p
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                    "width": width,
                    "height": height,
                }
            )
            yield out

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(target_rows_per_batch))
    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def deterministic_fake_frame_extractor(payload: bytes, n_frames: int) -> list[bytes]:
    """Stand-in for video frame decoding: split the byte stream into
    n_frames equal slices."""
    if payload is None or not n_frames:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)]


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    extract_fn: Callable[[bytes, int], list[bytes]] = deterministic_fake_frame_extractor,
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """Sample every ``every_n``-th frame from video payloads (C5
    frame-sample tier). One input row fans out to ceil(n_frames/every_n)
    narrow frame rows — the flatMap shape ``mapInPandas`` models
    naturally. Non-video rows produce no output."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                n_frames = (meta or {}).get("n_frames") or 0
                for i, frame in enumerate(extract_fn(payload, n_frames)):
                    if i % every_n == 0:
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(frame)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(target_rows_per_batch))
    return media.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


def media_summary(features: DataFrame) -> DataFrame:
    """Typed-metadata rollup over extracted features (pure built-ins)."""
    return features.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(
            F.sum(F.element_at("feature", 1).cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_f0"),
    )

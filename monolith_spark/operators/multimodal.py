"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(NotImplementedError or a deterministic fake) — but the Spark-side
plumbing is real and tested: binary column schema, Arrow-batched
mapInPandas with controlled batch sizes, typed metadata structs, and a
deterministic feature extractor whose output is reproducible anywhere.

At 100 TB the shape matters more than the codec: payloads stay in
executor-side Arrow batches end-to-end (never driver-collected),
`spark.sql.files.maxPartitionBytes` bounds scan partitions, and
feature extraction is a narrow map (zero shuffles).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: utf-8 payload
    bytes + typed metadata (the generic binary-column pattern)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — unavailable in this container (no PIL/cv2).

    STUB: raises. The Spark plumbing around it (arrow batching,
    schema) is exercised with extract_features' deterministic fake.
    """
    raise NotImplementedError(
        "image decoding requires an image codec library not present in "
        "this environment; use extract_features for the plumbing path"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a learned feature extractor: 8 floats
    from the md5 digest, in [0, 1)."""
    dig = hashlib.md5(payload).digest()
    return [int.from_bytes(dig[2 * i: 2 * i + 2], "big") / 65536.0 for i in range(FEATURE_DIM)]


def extract_features(df: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; yields the same rows plus a features array. The
    fake extractor is deterministic so tests (and re-runs on retries —
    important for speculative execution at scale) are stable.
    """

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start: start + batch_size]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].astype("int64"),
                        "n_bytes": chunk["payload"].map(len).astype("int64"),
                        "features": chunk["payload"].map(_fake_features),
                    }
                )

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


def resize_media(df: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """mapInPandas resize plumbing: payload → fixed (width*height)-byte
    "pixel buffer" + updated meta.

    A real implementation would decode_image() then interpolate; no
    codec exists in this container, so the resample step is a
    DETERMINISTIC FAKE (stride-sampled payload bytes, zero-padded).
    The Spark-side contract — Arrow batches in, binary out, meta struct
    updated, narrow map with zero shuffles — is the real, tested part.
    """
    target = width * height

    def _fake_resize(payload: bytes) -> bytes:
        if len(payload) >= target:
            stride = len(payload) / target
            return bytes(payload[int(i * stride)] for i in range(target))
        return payload + b"\x00" * (target - len(payload))

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("meta", MEDIA_SCHEMA["meta"].dataType, True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(_fake_resize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": resized,
                    "meta": [
                        {
                            "format": "raw/fake",
                            "n_bytes": len(p),
                            "width": width,
                            "height": height,
                        }
                        for p in resized
                    ],
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, out_schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing demo: slice fixed-stride byte windows
    from each payload (stand-in for video frame extraction) — pure
    Column ops, one row per (media_id, frame_no)."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.least(
                F.floor((F.length("payload") - 1) / every_n_bytes).cast("int"),
                F.lit(max_frames - 1),
            ),
        ),
        lambda i: F.struct(
            i.cast("int").alias("frame_no"),
            F.substring(F.col("payload"), i * every_n_bytes + 1, every_n_bytes).alias("frame"),
        ),
    )
    return (
        df.filter(F.length("payload") > 0)
        .select("media_id", F.explode(frames).alias("f"))
        .select("media_id", F.col("f.frame_no").alias("frame_no"), F.col("f.frame").alias("frame"))
    )

"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7.5).

Model: media lives as an opaque `binary` payload column plus a typed
metadata struct — mirroring the reference's bronze "raw blob + lineage"
pattern (reference: src/common/lake.py:59-71 blob handling) lifted into
columns. Decode/feature-extract/resize/frame-sample are Arrow-batched
`mapInPandas` operators so media bytes never round-trip per row.

The actual codecs (PIL/librosa/av) are NOT in this image, so the decode
kernels are stubbed: with SKYFIT_FAKE_DECODE=1 (default in tests) they
produce deterministic fake outputs with the real schema and batch
shape; otherwise they raise NotImplementedError naming the missing
dependency. The Spark-side plumbing — schemas, partitioning, UDF
signatures, batch iteration — is real and tested.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_binary_payload",
    "media_manifest",
    "decode_images",
    "decode_audio",
    "resize_images",
    "extract_embeddings",
    "sample_video_frames",
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)


def _fake_decode_enabled() -> bool:
    return os.environ.get("SKYFIT_FAKE_DECODE", "1") == "1"


def attach_binary_payload(df: DataFrame, source_col: str, *, mime: str = "application/octet-stream") -> DataFrame:
    """Lift a column into the media model: binary payload + metadata
    struct + content hash. For real pipelines the payload column comes
    from `spark.read.format('binaryFile')` or object-store manifests."""
    payload = F.col(source_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ),
    ).withColumn("content_md5", F.md5(payload)).withColumn(
        "byte_len", F.octet_length(payload)
    )


def media_manifest(df: DataFrame, id_col: str) -> DataFrame:
    """Typed manifest of a media table — the audit/inventory view."""
    return df.select(
        F.col(id_col),
        "content_md5",
        F.col("byte_len").cast("long").alias("byte_len"),
        F.col("media_meta.mime").alias("mime"),
    )


def _require_codec(lib: str) -> None:
    if not _fake_decode_enabled():
        raise NotImplementedError(
            f"media decode requires `{lib}`, which is not installed in this "
            "image; set SKYFIT_FAKE_DECODE=1 for the deterministic fake path"
        )


def decode_images(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """payload → (id, width, height, n_channels) via Arrow-batched
    mapInPandas. Fake path: dimensions derived deterministically from
    the content hash; real path: PIL (stubbed)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require_codec("PIL")
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).digest())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": digests.map(lambda d: 64 + d[0] % 192).astype("int32"),
                    "height": digests.map(lambda d: 64 + d[1] % 192).astype("int32"),
                    "n_channels": digests.map(lambda d: 1 + d[2] % 3).astype("int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, schema)


def extract_embeddings(df: DataFrame, *, id_col: str = "doc_id", dims: int = 8) -> DataFrame:
    """payload → fixed-width float feature vector. Fake path: bytes of
    md5 scaled to [0,1); real path: a vision/audio encoder (stubbed).
    Double-typed features: float32 would re-round byte/255.0 and break
    exact cross-engine reproducibility of the stub."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require_codec("torch")
        for pdf in batches:
            feats = pdf["payload"].map(
                lambda b: [x / 255.0 for x in hashlib.md5(bytes(b)).digest()[:dims]]
            )
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, "payload").mapInPandas(kernel, schema)


def decode_audio(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """payload → (id, sample_rate, n_samples, duration_ms, rms) via
    Arrow-batched mapInPandas. Fake path: stats derived deterministically
    from the content hash; real path: librosa/soundfile (stubbed)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require_codec("soundfile")
        rates = (8000, 16000, 22050, 44100, 48000)
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).digest())
            sr = digests.map(lambda d: rates[d[3] % len(rates)]).astype("int32")
            n = pdf["payload"].map(lambda b: len(bytes(b)) * 32).astype("int64")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": sr,
                    "n_samples": n,
                    "duration_ms": (n * 1000 // sr).astype("int64"),
                    "rms": digests.map(lambda d: d[4] / 255.0).astype("float64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, schema)


def resize_images(
    df: DataFrame, *, id_col: str = "doc_id", width: int = 224, height: int = 224
) -> DataFrame:
    """payload → resized payload + updated metadata (the normalize step
    before a vision encoder). Fake path: deterministic synthetic bytes
    of width·height length; real path: PIL resize (stubbed). Payload in,
    payload out — the 1→1 binary-transform mapInPandas shape."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require_codec("PIL")
        # Fake bytes = ASCII md5 hexdigest tiled to width·height. ASCII
        # (not raw digest bytes) so the construction is reproducible as
        # plain-string SQL in any engine: substr(repeat(md5(x), k), 1, w*h).
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: (
                    hashlib.md5(bytes(b)).hexdigest().encode()
                    * (width * height // 32 + 1)
                )[: width * height]
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, schema)


def sample_video_frames(
    df: DataFrame, *, id_col: str = "doc_id", every_ms: int = 1000
) -> DataFrame:
    """payload → one row per sampled frame (id, frame_idx, ts_ms,
    frame_md5). Fake path: frame count derived from byte length; real
    path: pyav (stubbed). Demonstrates the 1→N mapInPandas shape."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame_md5", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require_codec("av")
        # Fake frame hash chains through the ASCII content hash (not raw
        # bytes + a control byte) so it is reproducible as plain-string
        # SQL: md5(md5(x) || ':frame:' || i).
        for pdf in batches:
            out: dict[str, list] = {id_col: [], "frame_idx": [], "ts_ms": [], "frame_md5": []}
            for rid, b in zip(pdf[id_col], pdf["payload"]):
                data = bytes(b)
                n_frames = 1 + len(data) % 5
                h = hashlib.md5(data).hexdigest()
                for i in range(n_frames):
                    out[id_col].append(rid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame_md5"].append(
                        hashlib.md5(f"{h}:frame:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(kernel, schema)

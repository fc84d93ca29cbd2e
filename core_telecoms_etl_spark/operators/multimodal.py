"""Multimodal-column plumbing (north-star requirement).

Image/audio/video payloads are opaque `binary` columns with typed metadata.
The Spark-side plumbing — schemas, Arrow-batched UDF signatures, partition
sizing — is real and tested; the actual codec step is stubbed behind
`NotImplementedError` (no image/audio libraries in this container) with a
deterministic fake decoder for tests.

Scale notes:
- Binary payloads ride in parquet with metadata columns alongside; filters
  on metadata (mime, n_bytes) prune row groups WITHOUT touching payload
  bytes (columnar projection).
- Decode/feature steps run via mapInPandas so each Arrow batch amortizes
  Python transfer; `maxRecordsPerBatch` bounds memory for fat payloads.
- Repartition by payload size-bucket before decode to even out task cost.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, mime string, payload binary, "
    "width int, height int, duration_ms long"
)

DECODED_SCHEMA = "media_id long, mime string, n_bytes long, feature array<double>"


def binary_metadata(
    df: DataFrame, payload_col: str, *, id_col: str
) -> DataFrame:
    """JVM-side metadata over an opaque binary column: byte length +
    content digest. No payload bytes cross into Python."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("payload_sha256"),
    )


def decode_image_stub(payload: bytes) -> list[float]:
    """Codec stub — replace with a real decoder (PIL/libvips) on a cluster
    image. Raises so pipelines fail loudly rather than fake results."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; inject a decoder via decode_features(decoder=...)"
    )


def deterministic_fake_decoder(payload: bytes) -> list[float]:
    """Test decoder: 4 deterministic moments of the raw bytes."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    n = float(len(payload))
    s = float(sum(payload))
    mx = float(max(payload))
    mn = float(min(payload))
    return [n, s / n, mx, mn]


def decode_features(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    mime_col: str = "mime",
    payload_col: str = "payload",
    decoder: Callable[[bytes], list[float]] = decode_image_stub,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Arrow-batched decode → feature extraction via mapInPandas.

    The UDF signature, output schema, and batch iteration are the
    production shape; only `decoder` is environment-specific."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": pdf[mime_col],
                    "n_bytes": pdf[payload_col].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "feature": pdf[payload_col].map(
                        lambda b: decoder(bytes(b) if b is not None else b"")
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling plumbing: expand each clip into (media_id,
    frame_ts_ms) rows JVM-side; the per-frame decode then rides
    decode_features. Pure sequence/explode — no Python."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0), F.col(duration_col) - 1, F.lit(every_ms)
            )
        ),
    )


RESIZED_SCHEMA = "media_id long, mime string, width int, height int, payload binary"


def resize_images(
    df: DataFrame,
    *,
    target: tuple[int, int] = (224, 224),
    id_col: str = "media_id",
    mime_col: str = "mime",
    payload_col: str = "payload",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched image resize via mapInPandas — the standard
    pre-embedding normalization step. The codec is injected (`resizer`);
    without one this raises NotImplementedError per batch, loudly (no
    image library ships in this container). The Spark-side shape —
    batch iteration, output schema with the new dimensions, binary
    passthrough — is the production plumbing."""
    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is None:
                raise NotImplementedError(
                    "image resizing requires an image library not present "
                    "in this container; inject resize_images(resizer=...)"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": pdf[mime_col],
                    "width": tw,
                    "height": th,
                    "payload": pdf[payload_col].map(
                        lambda b: resizer(
                            bytes(b) if b is not None else b"", tw, th
                        )
                    ),
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def deterministic_fake_resizer(payload: bytes, w: int, h: int) -> bytes:
    """Test resizer: truncate/pad the byte stream to w*h bytes — keeps the
    batch plumbing honest (output size depends on the target dims)."""
    need = w * h
    if not payload:
        return b"\x00" * need
    return (payload * (need // len(payload) + 1))[:need]

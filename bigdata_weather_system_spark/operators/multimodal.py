"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The engine treats media as ``binary`` content columns with a typed metadata
struct, processed by Arrow-batched ``mapInPandas`` stages. The decode kernels
themselves (PIL/librosa/ffmpeg) are NOT available in this environment, so the
pixel/sample decode step is stubbed behind ``require_codec`` /
deterministic fake features — clearly marked. Everything Spark-side is real
and tested: schemas, batch iteration, partition sizing, UDF signatures.

Scale notes:
- media bytes never pass through Python row-at-a-time: ``mapInPandas``
  receives Arrow record batches; tune ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` down (e.g. 64) for multi-MB blobs so a batch fits in
  worker memory.
- binary columns make parquet row groups huge — store media in its own
  table/files, join metadata by content id, and prune columns early.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

#: Typed metadata carried alongside every media blob.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("byte_len", T.LongType(), True),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def require_codec(name: str):
    """Import a media codec library or fail loudly — decode kernels are
    stubbed in this container (no PIL/librosa/ffmpeg installed)."""
    import importlib

    try:
        return importlib.import_module(name)
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            f"media codec '{name}' is not available in this environment; "
            "the Spark plumbing is real but the decode kernel is stubbed"
        ) from exc


def to_media_table(
    df: DataFrame, id_col: str, payload_col: str, modality: str = "image"
) -> DataFrame:
    """Wrap an arbitrary string/binary column as a media table (used by
    tests and the contract queries to fabricate deterministic blobs)."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(f"application/x-{modality}").alias("mime_type"),
        content.alias("content"),
        F.octet_length(content).cast("long").alias("byte_len"),
    )


def decode_image_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched image decode → (dims, feature vector).

    With ``use_real_codec`` this would call PIL inside the batch loop; here
    the decode is a DETERMINISTIC FAKE (derived from the bytes) so the
    pipeline — batch iteration, schema, partition behavior — runs for real.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        if use_real_codec:
            require_codec("PIL.Image")  # raises NotImplementedError here
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["byte_len"],
                }
            )
            # fake decode: dims derived deterministically from content size.
            # byte_len is nullable — a null row makes the pandas column
            # float64 with NaN, which .astype("int32") rejects; treat null
            # as 0 bytes (matching the `c or b""` content fallback below)
            blen = pdf["byte_len"].fillna(0)
            out["width"] = (blen % 640 + 16).astype("int32")
            out["height"] = (blen % 480 + 16).astype("int32")
            out["feature"] = [
                np.frombuffer(
                    (bytes(c or b"") + b"\x00" * 16)[:16], dtype=np.uint8
                ).astype("float32")
                / 255.0
                for c in pdf["content"]
            ]
            yield out

    return media.mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling stub: emits one 'frame' per byte-stride chunk (a real
    implementation strides video frames via ffmpeg; the Spark shape — one
    input row fanning out to N output rows through mapInPandas — is what
    matters and is real)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content or b"")
                # ceil division: the partial tail chunk is a frame too
                n_frames = max(1, -(-len(blob) // every_n_bytes))
                for i in range(min(max_frames, n_frames)):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_bytes": blob[
                                i * every_n_bytes : (i + 1) * every_n_bytes
                            ],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return media.mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA)


def media_metadata_summary(media: DataFrame) -> DataFrame:
    """Pure-SQL metadata profile of a media table (oracle-checkable)."""
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("byte_len").alias("total_bytes"),
        F.min("byte_len").alias("min_bytes"),
        F.max("byte_len").alias("max_bytes"),
    )

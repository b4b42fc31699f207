"""Multimodal media operators: binary payload + typed metadata.

Design for 100 TB of media:

- A media table is ``(media_id, media_type, format, width, height,
  n_frames, payload binary)``. The payload is OPAQUE to the engine —
  filters/joins/selections run on the typed metadata columns so
  Catalyst prunes and pushes down without touching bytes; parquet
  column pruning means a metadata-only query never reads a payload
  page.
- Decode/resize/feature ops are ``mapInPandas`` (Arrow-batched): one
  Python worker round-trip per BATCH, never per row, and the iterator
  form streams batches so a partition never has to fit in worker
  memory at once. Batch size is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
  batch_rows x payload_size fits the worker (e.g. 64 rows of 10 MB
  images per 1 GB).
- All media ops are NARROW (no shuffle): payloads move zero times.
  Anything that must shuffle (e.g. grouping frames) should carry only
  (media_id, frame_idx, small features), never the payload.

The actual pixel codecs (PIL/ffmpeg/librosa) are not in this
container. ``decode_payload`` therefore implements a deterministic
'fake' codec — payload bytes are tiled into the declared (height,
width) grid — and raises NotImplementedError for real formats. The
operator signatures, schemas and batch handling are exactly what a
real codec would plug into.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

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

if TYPE_CHECKING:  # pragma: no cover
    import numpy as np
    import pandas as pd

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),  # fake | png | wav | mp4 ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes long, mean_intensity double, max_intensity long"

FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def as_media_table(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from `documents` (the test
    corpus has no real media; payload = utf8 bytes of the text, typed
    metadata from doc_id).

    Every derivation is a native column expression, so the construction
    itself is oracle-checkable (see queries/multimodal.py).
    """
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.lit("fake").alias("format"),
        (F.col("doc_id") % 16 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 8 + 1).cast("int").alias("height"),
        (F.col("doc_id") % 5 + 1).cast("int").alias("n_frames"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_payload(
    payload: bytes, fmt: str, width: int, height: int
) -> "np.ndarray":
    """STUB decode: the seam where PIL/ffmpeg would plug in.

    'fake' format: tile/truncate the payload bytes into a (height,
    width) uint8 array — deterministic, so tests can assert exact
    features. Real formats raise until a codec is available.
    """
    import numpy as np

    if fmt != "fake":
        raise NotImplementedError(
            f"codec for format {fmt!r} not available in this environment; "
            "plug a real decoder (PIL/ffmpeg) into decode_payload"
        )
    n = width * height
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = -(-n // len(buf))  # ceil division
    return np.tile(buf, reps)[:n].reshape(height, width)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode each payload and emit per-media scalar features.

    mapInPandas iterator form: Arrow batches stream through one
    Python worker per partition; only (id, 3 scalars) come back — the
    payload never re-serializes to the JVM.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            feats = []
            for r in pdf.itertuples(index=False):
                img = decode_payload(r.payload, r.format, r.width, r.height)
                feats.append(
                    (
                        r.media_id,
                        len(r.payload),
                        float(img.mean()),
                        int(img.max()),
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=["media_id", "n_bytes", "mean_intensity", "max_intensity"],
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of each decoded image, re-encoded as a
    raw byte payload with updated metadata (narrow map, same row
    count)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                img = decode_payload(r.payload, r.format, r.width, r.height)
                ys = (np.arange(out_h) * r.height // out_h).astype(int)
                xs = (np.arange(out_w) * r.width // out_w).astype(int)
                resized = img[np.ix_(ys, xs)]
                out.append(
                    (r.media_id, r.media_type, "fake", out_w, out_h,
                     r.n_frames, resized.tobytes())
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "media_type", "format", "width", "height",
                    "n_frames", "payload",
                ],
            )

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video rows: emit every n-th frame as its own
    (media_id, frame_idx, frame_payload) row.

    The fake codec treats the payload as n_frames equal slices. Output
    fan-out is bounded (n_frames/every_n per video); the frame payload
    is a slice, so bytes are copied once, still with no shuffle.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.media_type != "video" or r.n_frames <= 0:
                    continue
                frame_len = max(len(r.payload) // r.n_frames, 1)
                for i in range(0, r.n_frames, every_n):
                    start = i * frame_len
                    rows.append(
                        (r.media_id, i, r.payload[start:start + frame_len])
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_payload"]
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)

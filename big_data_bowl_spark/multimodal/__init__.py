"""Multimodal (image/audio/video) column support.

Opaque ``binary`` payloads + typed metadata structs, with decode /
feature-extraction / resize / frame-sampling as Arrow-batched
``mapInPandas`` operators. Real codecs are not available in this
environment — the decode step is STUBBED (deterministic fake for the
'fake' format, NotImplementedError otherwise) while the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested.
"""

from .media import (  # noqa: F401
    MEDIA_SCHEMA,
    as_media_table,
    decode_payload,
    extract_image_features,
    resize_images,
    sample_frames,
)

"""Multimodal (image/audio/video) column handling.

Media payloads ride as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction runs as Arrow-batched ``mapInPandas``
(the Spark-side plumbing — schema, partitioning, batch shape — is real and
tested; the actual codec step is stubbed because no image/audio libraries
ship in this environment, per the builder brief).
"""

from gofast_spark.multimodal.blobs import (
    BLOB_META_SCHEMA,
    attach_blob_meta,
    blob_features,
    resize_image_blobs,
    sample_video_frames,
    decode_image,
)

__all__ = [
    "BLOB_META_SCHEMA",
    "attach_blob_meta",
    "blob_features",
    "decode_image",
    "resize_image_blobs",
    "sample_video_frames",
]

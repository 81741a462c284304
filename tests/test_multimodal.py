"""Multimodal decoder backend gating (multimodal/blobs.py).

The blob plumbing itself is covered in test_llm_pipeline.py; this file
pins the optional-library contract: stub default, explicit pil, auto
fallback."""

def test_decoder_gating(spark):
    """Backend selection contract: 'stub' is deterministic and default;
    'pil' raises in this library-free container; 'auto' falls back to
    the stub; unknown names are rejected."""
    import pytest

    from gofast_spark.multimodal.blobs import (
        _pil,
        blob_features,
        resize_image_blobs,
    )

    df = spark.createDataFrame(
        [(1, bytes(range(32))), (2, None)], "id bigint, blob binary"
    )
    stub = blob_features(df, "id", "blob").collect()
    auto = blob_features(df, "id", "blob", decoder="auto").collect()
    if _pil() is None:
        assert sorted(map(tuple, stub)) == sorted(map(tuple, auto))
        with pytest.raises(Exception, match="Pillow"):
            blob_features(df, "id", "blob", decoder="pil").collect()
        with pytest.raises(Exception, match="Pillow"):
            resize_image_blobs(df, "id", "blob", resizer="pil").collect()
    with pytest.raises(ValueError, match="unknown decoder"):
        blob_features(df, "id", "blob", decoder="nope")
    with pytest.raises(ValueError, match="unknown resizer"):
        resize_image_blobs(df, "id", "blob", resizer="nope")

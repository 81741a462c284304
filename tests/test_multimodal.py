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


def test_blob_features_passthrough_columns(spark):
    """Metadata columns named in ``passthrough`` ride the Arrow batches
    untouched, so a per-source aggregate needs no features-to-metadata
    join (the multimodal_media_card_documents composition relies on
    this)."""
    from gofast_spark.multimodal import blob_features

    rows = [(1, "web", b"abcd"), (2, "web", b"xy"), (3, "book", b"")]
    df = spark.createDataFrame(rows, "id long, source string, payload binary")
    out = blob_features(df, "id", "payload", passthrough=["source"]).collect()
    assert [r["source"] for r in sorted(out, key=lambda r: r["id"])] == [
        "web", "web", "book",
    ]
    got = {r["id"]: r for r in out}
    assert got[1]["n_bytes"] == 4 and got[3]["n_bytes"] == 0
    # columns ordered (id, passthrough, features)
    assert blob_features(
        df, "id", "payload", passthrough=["source"]
    ).columns == ["id", "source", "n_bytes", "head_byte", "width", "height"]

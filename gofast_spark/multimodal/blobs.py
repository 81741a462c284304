"""Binary (media) column plumbing.

Design for 100 TB of media: payloads stay as parquet ``binary`` columns
(or file paths into an object store read via ``binaryFile`` source);
feature extraction is ``mapInPandas`` — Arrow ships each partition to
Python in columnar batches, the worker decodes batch-wise, and the output
schema is declared up front so Catalyst can prune/pushdown around the UDF.
Never collect blobs to the driver.

The decode itself is STUBBED (no PIL/ffmpeg in this container): a
deterministic fake derived from the payload bytes, clearly marked.  The
surrounding plumbing — schema, batch iteration, output contract — is the
real, tested part.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
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

if TYPE_CHECKING:
    import pandas as pd

# typed metadata carried next to every blob column
BLOB_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image/audio/video
        StructField("codec", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def attach_blob_meta(
    df: DataFrame, blob_col: str, *, media_type: str, codec: str
) -> DataFrame:
    """Attach the typed metadata struct for a binary column (computed
    inline during the scan — no shuffle)."""
    return df.withColumn(
        f"{blob_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(codec).alias("codec"),
            F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
        ),
    )


def _pil():
    """Import Pillow if present, else None — the optional real-decode
    backend.  Kept in one place so every gate below agrees."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes, *, backend: str = "pil") -> tuple[int, int]:
    """Decode an image payload to (width, height).

    ``backend='pil'`` uses Pillow and raises ``NotImplementedError`` when
    it is absent (this container ships no image library) so callers
    can't silently depend on it; ``backend='stub'`` returns the
    deterministic fake (what ``blob_features`` defaults to).
    """
    if backend == "stub":
        return _fake_decode(payload)
    if backend != "pil":
        raise ValueError(f"unknown backend {backend!r} (pil|stub)")
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "image decoding requires an image library (e.g. Pillow); "
            "not available in this environment"
        )
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return (im.width, im.height)
    except Exception:
        # NULL/truncated/undecodable payloads must not fail the whole
        # Spark job from inside an Arrow batch — degrade to the
        # deterministic stub dims (documented fallback)
        return _fake_decode(payload)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: pseudo width/height derived from
    the payload bytes.  Keeps the pipeline testable end-to-end."""
    s = sum(payload[:64]) if payload else 0
    return (64 + s % 256, 64 + (s * 31) % 256)


def _resolve_decoder(decoder: str):
    """Map a decoder request to the per-payload (width, height) function.

    ``"stub"`` (default) — deterministic fake, environment-independent
    (the oracle entries hash its output, so it must never silently
    change with the installed libraries).  ``"pil"`` — require Pillow,
    raise if absent.  ``"auto"`` — Pillow when importable, stub
    otherwise (the production setting; documented fallback).
    """
    if decoder == "stub":
        return _fake_decode
    if decoder in ("pil", "auto"):
        if _pil() is not None:
            return lambda p: decode_image(p, backend="pil")
        if decoder == "pil":
            raise NotImplementedError(
                "decoder='pil' requires Pillow, which is not installed"
            )
        return _fake_decode
    raise ValueError(f"unknown decoder {decoder!r} (stub|pil|auto)")


def blob_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    *,
    batch_hint: int | None = None,
    decoder: str = "stub",
    passthrough: Sequence[str] = (),
) -> DataFrame:
    """Per-blob features via Arrow-batched ``mapInPandas``.

    Output schema: (id, *passthrough, n_bytes, head_byte, width,
    height) — declared up front, so downstream column pruning works.
    width/height come from the decoder selected by ``decoder`` (see
    :func:`_resolve_decoder`; the default stub keeps outputs
    deterministic in library-free environments).  ``passthrough``
    names metadata columns (e.g. a ``source`` partition key) carried
    through the Arrow batches untouched, so a downstream groupBy
    doesn't need a features-to-metadata shuffle join.
    """
    passthru = list(passthrough)
    schema = StructType(
        [
            df.schema[id_col],
            *[df.schema[c] for c in passthru],
            StructField("n_bytes", LongType()),
            StructField("head_byte", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    cols = [id_col, *passthru, blob_col]
    decode = _resolve_decoder(decoder)

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[blob_col]
            dims = [decode(p if p is not None else b"") for p in payloads]
            out = {id_col: pdf[id_col]}
            for c in passthru:
                out[c] = pdf[c]
            out.update(
                {
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "head_byte": [p[0] if p else 0 for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(extract, schema=schema)


def resize_image_blobs(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    *,
    target: tuple[int, int] = (224, 224),
    out_col: str = "resized",
    resizer: str = "stub",
) -> DataFrame:
    """Batch image resize through ``mapInPandas`` — binary in, binary out
    plus the realized (width, height).

    ``resizer`` selects the kernel: ``"stub"`` (default) emits a
    deterministic payload derived from the source bytes and target dims
    — environment-independent, what the oracle entries hash; ``"pil"``
    decodes, bilinear-resizes, and re-encodes PNG via Pillow (raises if
    Pillow is absent); ``"auto"`` uses Pillow when importable, stub
    otherwise.  Either way the pipeline shape — Arrow batch iteration,
    binary-in/binary-out declared schema — is identical.
    Output schema: (id, resized binary, width int, height int).
    """
    schema = StructType(
        [
            df.schema[id_col],
            StructField("resized", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    tw, th = int(target[0]), int(target[1])
    use_pil = False
    if resizer in ("pil", "auto"):
        if _pil() is not None:
            use_pil = True
        elif resizer == "pil":
            raise NotImplementedError(
                "resizer='pil' requires Pillow, which is not installed"
            )
    elif resizer != "stub":
        raise ValueError(f"unknown resizer {resizer!r} (stub|pil|auto)")

    def _pil_resize(p: bytes) -> bytes:
        import io

        Image = _pil()
        try:
            with Image.open(io.BytesIO(p)) as im:
                buf = io.BytesIO()
                rs = getattr(Image, "Resampling", Image).BILINEAR
                im.resize((tw, th), resample=rs).save(
                    buf, format="PNG"
                )
                return buf.getvalue()
        except Exception:
            # undecodable payload: fall back to the stub bytes rather
            # than failing the whole job from inside an Arrow batch
            return bytes(p[:16]) + bytes([tw % 256, th % 256])

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[blob_col]
            out = []
            for p in payloads:
                p = p if p is not None else b""
                if use_pil:
                    out.append(_pil_resize(p))
                else:
                    # STUB resample: head bytes + dims tag, deterministic
                    out.append(bytes(p[:16]) + bytes([tw % 256, th % 256]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": out,
                    "width": [tw] * len(out),
                    "height": [th] * len(out),
                }
            )

    res = df.select(id_col, blob_col).mapInPandas(run, schema=schema)
    return res.withColumnRenamed("resized", out_col)


def sample_video_frames(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    *,
    n_frames: int = 4,
) -> DataFrame:
    """Uniform frame sampling from video blobs via ``mapInPandas`` — one
    output row per (video, frame), the exploded shape a training
    pipeline feeds to per-frame feature extractors.

    The frame decoder is STUBBED (no ffmpeg here): a deterministic fake
    derives a per-frame payload and timestamp from the source bytes and
    frame index, so the real parts — the 1-to-N row fan-out inside the
    Arrow batch, the declared schema, the deterministic frame indexing —
    are tested.  Output: (id, frame_idx int, ts_ms long, frame binary).
    """
    schema = StructType(
        [
            df.schema[id_col],
            StructField("frame_idx", IntegerType()),
            StructField("ts_ms", LongType()),
            StructField("frame", BinaryType()),
        ]
    )
    k = int(n_frames)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for rid, p in zip(pdf[id_col], pdf[blob_col]):
                p = p if p is not None else b""
                # STUB: fake duration from payload size, uniform timestamps
                dur_ms = 1000 + (len(p) * 37) % 60000
                for j in range(k):
                    ids.append(rid)
                    idxs.append(j)
                    tss.append(dur_ms * j // max(k - 1, 1))
                    frames.append(bytes(p[j : j + 8]) + bytes([j]))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "frame": frames,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)

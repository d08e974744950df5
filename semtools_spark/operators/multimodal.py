"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata — the training-data-pipeline extension for non-text payloads.

The Spark-side plumbing is real and tested: schemas, Arrow-batched UDF
signatures (``mapInPandas`` over binary columns), partition behavior, and
the explode pattern for frame sampling. The codec step: **PNG decodes
for real** (r8 — stdlib zlib + filter reconstruction,
:mod:`png_decode`; metadata comes from IHDR without touching pixels,
and :func:`image_pixels` materializes full RGB(A) rows), and
**JPEG/GIF/BMP report real dimensions** from their fixed-layout headers
(:mod:`image_meta` — no entropy decode needed). PIXEL decode for
entropy-coded formats (JPEG's DCT+Huffman) remains STUBBED: the sandbox
ships no codec libraries and those decoders are not reproducible with
stdlib alone — ``decode_image_meta`` tries PIL for anything else and
otherwise derives deterministic fake dimensions from the byte content
(clearly marked below). Swapping in a real decoder changes ONE inner
function, none of the Spark plumbing.

Scale notes: binary payloads ride the same partitions as their keys (no
shuffle introduced here); metadata extraction is map-only; frame sampling
is a controlled explode whose fan-out factor is explicit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)

try:  # pragma: no cover - PIL not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def _decode_one(b: bytes) -> tuple[int, int, int, str]:
    """PNG/JPEG/GIF/BMP: REAL header decode — PNG via IHDR
    (:func:`png_decode.png_meta`), the rest via their fixed-layout
    headers (:mod:`image_meta`); none of these touch pixel data. Other
    formats: STUB — with PIL installed this opens the image; without it
    (this container) it derives deterministic fake dimensions from the
    byte length. The Spark plumbing around it is identical either way."""
    from semtools_spark.operators.image_meta import sniff_dimensions
    from semtools_spark.operators.png_decode import png_meta

    n = len(b)
    meta = png_meta(b)
    if meta is not None:
        w, h, _depth, _ctype = meta
        return n, w, h, "png"
    sniffed = sniff_dimensions(b)
    if sniffed is not None:
        w, h, fmt = sniffed
        return n, w, h, fmt
    if _HAVE_PIL:  # pragma: no cover
        import io

        try:
            with Image.open(io.BytesIO(b)) as im:
                return n, im.width, im.height, (im.format or "raw").lower()
        except Exception:
            pass
    fmt = "png" if b[:4] == b"\x89PNG" else "raw"
    return n, (n % 512) + 32, ((n * 31) % 512) + 32, fmt


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "media"
) -> DataFrame:
    """Deterministic binary payload column for testing the multimodal path
    (stands in for a real image/audio blob; utf-8 bytes of the text)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def decode_image_meta(
    df: DataFrame, binary_col: str = "media", out_col: str = "img"
) -> DataFrame:
    """binary → struct(n_bytes, width, height, fmt) via an Arrow-batched
    pandas UDF (no per-row Spark Python)."""

    @F.pandas_udf(IMAGE_META_SCHEMA)
    def _meta(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in batches:
            rows = [_decode_one(bytes(b) if b is not None else b"") for b in s]
            yield pd.DataFrame(
                rows, columns=["n_bytes", "width", "height", "fmt"]
            ).astype(
                {"n_bytes": "int64", "width": "int32", "height": "int32"}
            )

    return df.withColumn(out_col, _meta(F.col(binary_col)))


IMAGE_PIXELS_SCHEMA_FIELDS = [
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("pixels", T.BinaryType(), True),
]


def image_pixels(
    df: DataFrame,
    binary_col: str = "media",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """binary → (*id_cols, width, height, channels, pixels): REAL pixel
    decode for PNGs (:func:`png_decode.decode_png` — zlib inflate +
    filter reconstruction, palette expanded to RGB); non-PNG rows yield
    NULLs (the honest degrade — no codecs for JPEG etc. in stdlib).
    ``mapInPandas`` so undecodable payloads cost nothing downstream and
    the (potentially large) pixel buffers stream through Arrow batches
    instead of accumulating per-task."""
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + IMAGE_PIXELS_SCHEMA_FIELDS
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from semtools_spark.operators.png_decode import decode_png

        for b in batches:
            rows = []
            for p in b[binary_col]:
                dec = decode_png(bytes(p)) if p is not None else None
                rows.append(
                    (None, None, None, None) if dec is None else dec
                )
            out = {c: b[c] for c in id_cols}
            out["width"] = pd.array(
                [r[0] for r in rows], dtype="Int32"
            )
            out["height"] = pd.array([r[1] for r in rows], dtype="Int32")
            out["channels"] = pd.array([r[2] for r in rows], dtype="Int32")
            out["pixels"] = pd.Series([r[3] for r in rows], dtype=object)
            yield pd.DataFrame(out)

    cols = list(id_cols) + [binary_col]
    return df.select(*cols).mapInPandas(_decode, schema=out_schema)


def frame_sample(
    df: DataFrame,
    binary_col: str = "media",
    frame_bytes: int = 64,
    every_n: int = 4,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """'Video' frame sampling: slice the payload into fixed-size frames and
    keep every n-th — a mapInPandas with an explicit, bounded fan-out
    (the real-codec version swaps the slicer for a keyframe extractor).
    Returns (*id_cols, frame_no, frame: binary)."""
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            payloads = [bytes(p) if p is not None else b"" for p in b[binary_col]]
            # frames kept per row: ceil((len // frame_bytes) / every_n)
            kept = np.array(
                [-(-(len(p) // frame_bytes) // every_n) for p in payloads],
                dtype=np.int64,
            )
            if int(kept.sum()) == 0:
                yield pd.DataFrame(
                    {c: pd.Series([], dtype=b[c].dtype) for c in id_cols}
                    | {"frame_no": pd.Series([], dtype="int32"),
                       "frame": pd.Series([], dtype=object)}
                )
                continue
            row_idx = np.repeat(np.arange(len(payloads)), kept)
            # frame_no within each row: 0, every_n, 2·every_n, …
            offsets = np.concatenate([np.arange(k) for k in kept]) * every_n
            frames = [
                payloads[r][o * frame_bytes:(o + 1) * frame_bytes]
                for r, o in zip(row_idx.tolist(), offsets.tolist())
            ]
            out = {c: b[c].to_numpy()[row_idx] for c in id_cols}
            out["frame_no"] = offsets.astype("int32")
            out["frame"] = frames
            yield pd.DataFrame(out)

    cols = list(id_cols) + [binary_col]
    return df.select(*cols).mapInPandas(_frames, schema=out_schema)

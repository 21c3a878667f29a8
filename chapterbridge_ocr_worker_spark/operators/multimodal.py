"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride through Spark as BinaryType columns with struct
metadata; the decode/feature steps run in Arrow-batched ``mapInPandas``.
The container has no image/audio libraries, so the decode kernels are
STUBBED — real cv2/librosa calls raise NotImplementedError behind an
import-try (and the FAKEIMG codec stands in for CI) — but the Spark-side
surface (schemas, batch iterators, partitioning, signatures) is real and
tested; a deployment only swaps the kernel body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..engine.fakeimg import decode as fake_decode

try:  # real decode path, not in this container
    import cv2  # noqa: F401

    _HAVE_CV2 = True
except Exception:
    _HAVE_CV2 = False

MEDIA_META = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("byte_size", T.LongType()),
        T.StructField("format", T.StringType()),     # fakeimg | jpeg | png | unknown
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_regions", T.IntegerType()),  # text regions / frames / channels
        T.StructField("error", T.StringType()),
    ]
)


def _sniff(data: bytes) -> str:
    if data[:8] == b"FAKEIMG1":
        return "fakeimg"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


def _decode_real(data: bytes):  # pragma: no cover - needs cv2
    if not _HAVE_CV2:
        raise NotImplementedError(
            "real image decode needs cv2 (not in this container)"
        )
    raise NotImplementedError("real decode kernel: wire cv2.imdecode here")


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in MEDIA_META.fields}
        for ref, content in zip(pdf["media_ref"], pdf["content"]):
            row = dict.fromkeys(out)
            row["media_ref"] = ref
            try:
                data = bytes(content)
                row["byte_size"] = len(data)
                fmt = _sniff(data)
                row["format"] = fmt
                if fmt == "fakeimg":
                    img = fake_decode(data)
                    row.update(
                        width=img.width, height=img.height, n_regions=len(img.lines)
                    )
                elif fmt in ("jpeg", "png"):
                    _decode_real(data)
                else:
                    raise ValueError(f"unsupported media format: {fmt}")
            except Exception as exc:
                row["error"] = str(exc)[:1000]
            for k, v in row.items():
                out[k].append(v)
        yield pd.DataFrame(out)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """(media_ref, content) -> MEDIA_META rows. Arrow-batched; the pattern
    for any decode/resize/frame-sample kernel."""
    return media.select("media_ref", "content").mapInPandas(
        _meta_batches, schema=MEDIA_META
    )

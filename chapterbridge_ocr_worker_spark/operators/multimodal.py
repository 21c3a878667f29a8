"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride through Spark as BinaryType columns with struct
metadata; the decode/feature steps run in Arrow-batched ``mapInPandas``.
Each kernel has TWO decode paths behind one signature: the FAKEIMG codec
(CI path — real geometry transforms, fully value-oracled in queries.py)
and a real cv2 path (imdecode/resize/band-slice/pixel stats) behind an
import gate, since this container ships no image libraries — where cv2 is
absent a jpeg/png row dead-letters with NotImplementedError instead of
killing the task (tests/test_real_kernels.py covers both sides of the
gate). The Spark-side surface (schemas, batch iterators, partitioning,
signatures) is identical either way.
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


def _decode_real(data: bytes):
    """cv2.imdecode kernel — the real-image twin of fake_decode, mirroring
    engine/paddle.py:64-69: bytes -> (BGR ndarray, width, height, channels).
    Import-gated (cv2 absent in this container; tests/test_real_kernels.py
    exercises it where present). Raises ValueError on undecodable bytes so
    callers dead-letter the row, never the task."""
    if not _HAVE_CV2:  # pragma: no cover - exercised where cv2 exists
        raise NotImplementedError(
            "real image decode needs cv2 (not in this container)"
        )
    import numpy as np  # pragma: no cover - below runs only with cv2

    arr = np.frombuffer(data, dtype=np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("cv2.imdecode failed (corrupt or unsupported image)")
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    return img, w, h, ch


def _encode_real(img) -> bytes:  # pragma: no cover - needs cv2
    ok, buf = cv2.imencode(".png", img)
    if not ok:
        raise ValueError("cv2.imencode failed")
    return buf.tobytes()


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
                    _, w, h, ch = _decode_real(data)
                    # n_regions carries channels for real rasters (the
                    # struct comment documents the per-format meaning)
                    row.update(width=w, height=h, n_regions=ch)
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


# --- resize / frame-sample / feature-extract -------------------------------
# The remaining three kernels of the multimodal quartet. Over the FAKEIMG
# codec they are REAL transformations (coordinate scaling, band slicing,
# content statistics), not fakes of convenience; jpeg/png route through the
# same import-gated _decode_real as metadata. Every kernel dead-letters per
# row via an `error` column — a corrupt blob never kills the task.

RESIZED = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)

FRAMES = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("y_start", T.IntegerType()),
        T.StructField("y_end", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("error", T.StringType()),
    ]
)


def resize_media(media: DataFrame, max_height: int = 2000) -> DataFrame:
    """Downscale blobs taller than max_height, preserving aspect ratio.
    FAKEIMG kernel scales dimensions and line geometry (ints, floor); real
    images would be cv2.resize behind the same gate."""
    from ..engine.fakeimg import FakeLine, encode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in RESIZED.fields}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                row = dict.fromkeys(out)
                row["media_ref"] = ref
                try:
                    data = bytes(content)
                    if _sniff(data) != "fakeimg":
                        # real raster: cv2.resize behind the import gate
                        rimg, w0, h0, _ = _decode_real(data)
                        s = min(1.0, max_height / h0) if h0 else 1.0
                        if s >= 1.0:
                            row.update(content=data, width=w0, height=h0, scale=1.0)
                        else:  # pragma: no cover - needs cv2
                            w = max(1, int(w0 * s))
                            h = max(1, int(h0 * s))
                            small = cv2.resize(
                                rimg, (w, h), interpolation=cv2.INTER_AREA
                            )
                            row.update(
                                content=_encode_real(small), width=w, height=h,
                                scale=round(s, 6),
                            )
                        for k, v in row.items():
                            out[k].append(v)
                        continue
                    img = fake_decode(data)
                    s = min(1.0, max_height / img.height) if img.height else 1.0
                    if s >= 1.0:
                        row.update(
                            content=data, width=img.width, height=img.height, scale=1.0
                        )
                    else:
                        lines = [
                            FakeLine(
                                int(l.x * s), int(l.y * s),
                                max(1, int(l.w * s)), max(1, int(l.h * s)),
                                l.contrast, l.text,
                            )
                            for l in img.lines
                        ]
                        w, h = max(1, int(img.width * s)), max(1, int(img.height * s))
                        row.update(
                            content=encode(w, h, lines), width=w, height=h,
                            scale=round(s, 6),
                        )
                except Exception as exc:
                    row["error"] = str(exc)[:1000]
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.select("media_ref", "content").mapInPandas(kernel, schema=RESIZED)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Cut each blob into n_frames horizontal bands, one output row per
    band (the video frame-sampling shape: one binary in, many binaries
    out). FAKEIMG kernel slices geometry for real; lines are assigned to
    the band holding their top edge, translated to band-local coords."""
    from ..engine.fakeimg import FakeLine, encode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in FRAMES.fields}

            def emit(ref, idx, y0, y1, content, error):
                out["media_ref"].append(ref)
                out["frame_idx"].append(idx)
                out["y_start"].append(y0)
                out["y_end"].append(y1)
                out["content"].append(content)
                out["error"].append(error)

            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    data = bytes(content)
                    if _sniff(data) != "fakeimg":
                        # real raster: band-slice the pixel array (cv2 gate)
                        rimg, _, h0, _ = _decode_real(data)
                        band = max(1, h0 // n_frames)  # pragma: no cover
                        for i in range(n_frames):  # pragma: no cover
                            y0 = i * band
                            y1 = h0 if i == n_frames - 1 else (i + 1) * band
                            emit(ref, i, y0, y1, _encode_real(rimg[y0:y1]), None)
                        continue
                    img = fake_decode(data)
                    band = max(1, img.height // n_frames)
                    for i in range(n_frames):
                        y0 = i * band
                        y1 = img.height if i == n_frames - 1 else (i + 1) * band
                        lines = [
                            FakeLine(l.x, l.y - y0, l.w, l.h, l.contrast, l.text)
                            for l in img.lines
                            if y0 <= l.y < y1
                        ]
                        emit(ref, i, y0, y1, encode(img.width, y1 - y0, lines), None)
                except Exception as exc:
                    emit(ref, -1, None, None, None, str(exc)[:1000])
            yield pd.DataFrame(out)

    return media.select("media_ref", "content").mapInPandas(kernel, schema=FRAMES)


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic content feature vector per blob — the embedding-side
    input for the similarity family: [log1p(bytes), width/1e3, height/1e3,
    n_regions, mean contrast/255, mean text len, text coverage]. A real
    deployment swaps in a vision encoder behind the same signature."""
    import math

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in FEATURES.fields}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                row = dict.fromkeys(out)
                row["media_ref"] = ref
                try:
                    data = bytes(content)
                    if _sniff(data) != "fakeimg":
                        # real raster: same 7-dim contract, pixel-statistic
                        # slots (channels / mean / std / edge energy) where
                        # the FAKEIMG path reports line-geometry stats
                        rimg, w0, h0, ch = _decode_real(data)
                        import numpy as np  # pragma: no cover - needs cv2

                        gray = (  # pragma: no cover
                            rimg.mean(axis=2) if rimg.ndim == 3 else rimg
                        )
                        row["features"] = [  # pragma: no cover
                            round(math.log1p(len(data)), 4),
                            w0 / 1e3,
                            h0 / 1e3,
                            float(ch),
                            round(float(gray.mean()) / 255.0, 4),
                            round(float(gray.std()) / 255.0, 4),
                            round(
                                float(np.abs(np.diff(gray, axis=0)).mean()) / 255.0, 4
                            ),
                        ]
                        for k, v in row.items():  # pragma: no cover
                            out[k].append(v)
                        continue  # pragma: no cover
                    img = fake_decode(data)
                    n = len(img.lines)
                    area = float(img.width * img.height) or 1.0
                    row["features"] = [
                        round(math.log1p(len(data)), 4),
                        img.width / 1e3,
                        img.height / 1e3,
                        float(n),
                        round(sum(l.contrast for l in img.lines) / (255.0 * n), 4)
                        if n else 0.0,
                        round(sum(len(l.text) for l in img.lines) / n, 4) if n else 0.0,
                        round(sum(l.w * l.h for l in img.lines) / area, 4),
                    ]
                except Exception as exc:
                    row["error"] = str(exc)[:1000]
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.select("media_ref", "content").mapInPandas(kernel, schema=FEATURES)

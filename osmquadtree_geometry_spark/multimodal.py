"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode step is STUBBED (image/audio libs are not in this
container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded from
the payload hash) produces stable feature vectors — the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is
real and tested either way.
"""

from __future__ import annotations

import hashlib
import io
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # feature-detect a real imaging backend (absent in this container)
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - exercised when PIL is absent
    _PILImage = None

HAVE_PIL = _PILImage is not None

MEDIA_SCHEMA = ("doc_id string, media_ref string, kind string, "
                "payload binary, width int, height int")

FEATURE_SCHEMA = ("doc_id string, media_ref string, kind string, "
                  "width int, height int, n_bytes long, "
                  "features array<float>")


def synth_media_table(media: DataFrame) -> DataFrame:
    """Attach a deterministic opaque payload to each media span
    (stands in for fetched raster tiles): payload = md5-stream of the
    tile ref, sized by zoom."""
    return media.select(
        "doc_id", F.col("tile").alias("media_ref"),
        F.lit("image/png").alias("kind"),
        F.to_binary(F.md5("tile"), F.lit("hex")).alias("payload"),
        F.lit(256).alias("width"), F.lit(256).alias("height"))


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in features: component j is the top 24 md5
    bits of ``hex(payload)#j`` scaled to [0, 1).  24-bit dyadic
    rationals are exactly representable in float32, so the values are
    engine-portable bit-for-bit (the driver's DuckDB oracle re-derives
    them in SQL — an RNG-based fake would not be checkable)."""
    hx = payload.hex()
    out = np.empty(dim, np.float32)
    for j in range(dim):
        h = hashlib.md5(f"{hx}#{j}".encode()).hexdigest()
        out[j] = int(h[:6], 16) / float(1 << 24)
    return out


def _real_decode(payload: bytes, dim: int) -> np.ndarray:
    """Real decode path (active only when PIL is importable): decode
    the payload, grayscale, mean-pool to a k*k thumbnail with
    k = ceil(sqrt(dim)), and emit the first ``dim`` pixels scaled to
    [0, 1).  Deterministic for a given payload — ``Image.resize`` with
    box filter is pure arithmetic — so tests can pin values."""
    img = _PILImage.open(io.BytesIO(payload)).convert("L")
    k = max(1, math.isqrt(dim - 1) + 1) if dim > 1 else 1
    small = np.asarray(img.resize((k, k), _PILImage.BOX), np.float32)
    return (small.reshape(-1)[:dim] / 256.0).astype(np.float32)


def decode_image(payload: bytes, *, fake: bool = False, dim: int = 8) -> np.ndarray:
    """Image decode: the real path runs when PIL is present; otherwise
    it is an honest STUB (raises with instructions).  ``fake=True``
    always selects the deterministic oracle-checkable stand-in."""
    if fake:
        return _fake_decode(payload, dim)
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires an imaging library not present in "
            "this container; pass fake=True for the deterministic stub")
    return _real_decode(payload, dim)


def extract_features(media_bin: DataFrame, dim: int = 8,
                     fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    batch shape a decode/resize/embed stage would use (one Arrow batch
    in, one out; no per-row Python UDF)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=fake, dim=dim).tolist()
                     for p in pdf["payload"]]
            out = pdf[["doc_id", "media_ref", "kind", "width", "height"]].copy()
            out["n_bytes"] = pdf["payload"].map(len).astype("int64")
            out["features"] = feats
            yield out

    return media_bin.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(video: DataFrame, every_n: int = 10) -> DataFrame:
    """Plumbing for frame sampling: (doc_id, media_ref, frame_idx)
    rows for frames 0, n, 2n, ... of a declared frame count column —
    pure SQL fan-out; the decode itself is the stubbed step."""
    return video.select(
        "doc_id", "media_ref",
        F.explode(F.expr(f"sequence(0, greatest(n_frames - 1, 0), {every_n})"))
        .alias("frame_idx"))

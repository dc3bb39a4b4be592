"""Deterministic image augmentation — the training-batch transform
stage (flip / rotate / crop / brightness jitter), reproducible by
construction.

The randomness contract: every choice is a pure bit-slice of an
integer ``aug_key`` column the CALLER provides (default:
``pmod(xxhash64(image_id, seed), 2^20)`` — JVM-side, shuffle-stable).
Keys-as-columns means a re-run, a resumed job, or a different
partitioning produces byte-identical augmented output — the property
torch-style per-worker RNG streams famously do not have — and the
oracle can recompute the key as a closed form of the row id in SQL.

Kernels are whole-array numpy (flips/rot90 are views; crop is a
slice; jitter is one vectorized add + clip with F6 floor(x+0.5)
rounding); per-image python is O(1) dispatch.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .codec import decode_image, encode_png

KEY_BITS = 20  # callers mod their key into [0, 2^20)


def default_aug_key(seed: int) -> Column:
    """pmod(xxhash64(image_id, seed), 2^KEY_BITS) — deterministic,
    shuffle-stable, and independent per seed."""
    return F.pmod(F.xxhash64(F.col("image_id"), F.lit(seed)),
                  F.lit(1 << KEY_BITS)).cast("long")


def apply_augment(
    img: np.ndarray, key: int, out_w: int, out_h: int
) -> np.ndarray:
    """Pure augmentation: hflip (bit 0) → rot90×k (bits 1-2) → random
    crop to (out_h, out_w) (bits 3-12 pick the offsets via modulo over
    the legal range) → brightness jitter in [-16, +16] (bits 13-19),
    clipped.  Raises if the (possibly rotated) image is smaller than
    the crop — augmentation never upscales."""
    if img.ndim == 2:
        img = img[:, :, None]
    if key & 1:
        img = img[:, ::-1]
    rot = (key >> 1) & 3
    if rot:
        img = np.rot90(img, rot)
    h, w = img.shape[:2]
    if h < out_h or w < out_w:
        raise ValueError(
            f"crop {out_w}x{out_h} exceeds rotated image {w}x{h}"
        )
    cy = ((key >> 3) & 31) % (h - out_h + 1)
    cx = ((key >> 8) & 31) % (w - out_w + 1)
    img = img[cy: cy + out_h, cx: cx + out_w]
    delta = ((key >> 13) % 33) - 16
    out = np.clip(img.astype(np.int64) + delta, 0, 255)
    return np.ascontiguousarray(out.astype(np.uint8))


def augment_images(
    images: DataFrame,
    out_w: int,
    out_h: int,
    aug_key: Column | None = None,
    seed: int = 0,
) -> DataFrame:
    """(image_id, bytes, fmt) → (image_id, aug_key, bytes, w, h) with
    the augmented image re-encoded as PNG (lossless — augmented bytes
    decode back to exactly apply_augment's pixels).  ``aug_key``
    defaults to default_aug_key(seed); pass a Column to control the
    policy (e.g. a closed form of the id, or a constant for
    center-crop-only eval preprocessing)."""
    import pandas as pd

    key = aug_key if aug_key is not None else default_aug_key(seed)
    tagged = images.withColumn("aug_key", key)

    def kernel(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                img = decode_image(bytes(row.bytes), row.fmt)
                out = apply_augment(img, int(row.aug_key), out_w, out_h)
                recs.append(
                    (row.image_id, int(row.aug_key), encode_png(out),
                     out_w, out_h)
                )
            yield pd.DataFrame(
                recs, columns=["image_id", "aug_key", "bytes", "w", "h"]
            )

    return tagged.mapInPandas(
        kernel,
        schema="image_id string, aug_key long, bytes binary, w int, h int",
    )

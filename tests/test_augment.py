"""Deterministic augmentation: bit-slice policy closed forms, involution
properties, crop bounds, and the Spark operator vs the pure function."""

from __future__ import annotations

import numpy as np
import pytest

from osm_render_spark.raster.augment import (
    apply_augment,
    augment_images,
    default_aug_key,
)
from osm_render_spark.raster.codec import decode_png, encode_png


def _img(seed=0, h=24, w=30):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


NEUTRAL = 16 << 13  # brightness delta = (16 % 33) - 16 = 0


def test_neutral_key_is_identity():
    img = _img()
    out = apply_augment(img, NEUTRAL, 30, 24)
    assert (out == img).all()  # no flip, no rot, (0,0) crop, +0 jitter
    # key 0 is the darkest jitter: delta = (0 % 33) - 16 = -16
    assert (apply_augment(img, 0, 30, 24)
            == np.clip(img.astype(int) - 16, 0, 255)).all()


def test_bit_slices_drive_each_transform():
    img = _img()
    # bit 0: hflip only
    assert (apply_augment(img, NEUTRAL | 1, 30, 24) == img[:, ::-1]).all()
    # bits 1-2: rot90 — rotated once, dims swap (crop must fit 24x30)
    assert (apply_augment(img, NEUTRAL | 2, 24, 30) == np.rot90(img, 1)).all()
    # bits 3-7 (cy) and 8-12 (cx): crop offsets modulo the legal range
    # legal ranges here: cy in [0,5), cx in [0,3)
    out = apply_augment(img, NEUTRAL | (7 << 3) | (5 << 8), 28, 20)
    assert (out == img[7 % 5: 7 % 5 + 20, 5 % 3: 5 % 3 + 28]).all()
    # bits 13+: brightness delta = (key>>13) % 33 - 16, clipped
    bright = apply_augment(img, 32 << 13, 30, 24)    # delta +16
    assert (bright == np.clip(img.astype(int) + 16, 0, 255)).all()


def test_involutions_and_grayscale():
    img = _img(1)
    flip_key = 1 | (16 << 13)  # hflip, no rot/crop range, neutral jitter
    once = apply_augment(img, flip_key, 30, 24)
    assert (apply_augment(once, flip_key, 30, 24) == img).all()
    # rot90 four times via four single rotations
    cur, key = img, 2 | (16 << 13)
    for _ in range(4):
        cur = apply_augment(
            cur, key, cur.shape[0], cur.shape[1]
        )
    assert (cur == img).all()
    # 2-D grayscale input takes the same path
    g = _img(2)[:, :, 0]
    assert apply_augment(g, 0, 30, 24).shape == (24, 30, 1)


def test_crop_never_upscales():
    with pytest.raises(ValueError):
        apply_augment(_img(), 0, 31, 24)
    with pytest.raises(ValueError):
        # after rot90 the axes swap: 30 wide no longer fits
        apply_augment(_img(), 2, 30, 24)


def test_operator_matches_pure_function_and_is_shuffle_stable(spark):
    rows = [(f"im{i}", bytearray(encode_png(_img(i, 32, 32))), "png")
            for i in range(20)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = augment_images(df, 24, 24, seed=7)
    got = {r["image_id"]: r for r in out.collect()}
    keys = {r["image_id"]: r["aug_key"] for r in out.collect()}
    for i in range(20):
        img = _img(i, 32, 32)
        expect = apply_augment(img, keys[f"im{i}"], 24, 24)
        assert (decode_png(bytes(got[f"im{i}"]["bytes"])) == expect).all()
        assert (got[f"im{i}"]["w"], got[f"im{i}"]["h"]) == (24, 24)
    # repartitioned input → byte-identical output (keys ride the rows)
    out2 = {r["image_id"]: bytes(r["bytes"])
            for r in augment_images(df.repartition(7), 24, 24, seed=7).collect()}
    assert out2 == {k: bytes(v["bytes"]) for k, v in got.items()}
    # a different seed changes at least one augmentation
    out3 = {r["image_id"]: bytes(r["bytes"])
            for r in augment_images(df, 24, 24, seed=8).collect()}
    assert out3 != out2
    # explicit constant key = deterministic eval preprocessing
    from pyspark.sql import functions as F

    fixed = augment_images(df, 24, 24, aug_key=F.lit(16 << 13)).collect()
    for r in fixed:
        img = _img(int(r["image_id"][2:]), 32, 32)
        assert (decode_png(bytes(r["bytes"])) == img[:24, :24]).all()


def test_default_key_range(spark):
    df = spark.createDataFrame(
        [(f"x{i}",) for i in range(200)], "image_id string"
    ).withColumn("k", default_aug_key(3))
    ks = [r["k"] for r in df.collect()]
    assert all(0 <= k < (1 << 20) for k in ks)
    assert len(set(ks)) > 150  # keys actually vary

"""The `images` table generator — BASELINE.json input_hint shape
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64), FIXTURES.md §1.

Deterministic pure function of (n, seed): pixel content is solid base +
gradient + filled polygons derived arithmetically from the row index
(the RNG seeds only the lon/lat placement). PNG rows round-trip
byte-stable; "jpeg" rows go through the REAL baseline JPEG codec
(raster/jpeg.py) and exercise the lossy PSNR path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..raster.codec import encode_image, phash64
from ..raster.kernels import fill_polygon, new_surface

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
    ]
)

MODES = ("base", "hover", "active", "callout")


def image_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-image pattern: solid + gradient + polygons."""
    surf = new_surface(w, h, ((i * 37) % 256, (i * 59) % 256, (i * 83) % 256, 255))
    # horizontal gradient on the green channel
    surf[:, :, 1] = ((np.arange(w)[None, :] * 255) // max(w - 1, 1)).astype(np.uint8)
    # two polygons derived from i
    cx, cy = (i * 131) % w, (i * 173) % h
    r = 5 + (i % 40)
    tri = np.array(
        [[cx, cy - r], [cx + r, cy + r], [cx - r, cy + r]], dtype=np.float64
    )
    quad = np.array(
        [
            [(i * 17) % w, (i * 19) % h],
            [(i * 17 + 30) % w, (i * 19) % h],
            [(i * 17 + 30) % w, (i * 19 + 30) % h],
            [(i * 17) % w, (i * 19 + 30) % h],
        ],
        dtype=np.float64,
    )
    fill_polygon(surf, [tri], ((i * 7) % 256, (i * 11) % 256, (i * 13) % 256, 255))
    fill_polygon(surf, [quad], ((i * 23) % 256, (i * 29) % 256, (i * 31) % 256, 200))
    return surf


def _size_for(i: int) -> int:
    # mostly reference sizes (OsmRender.m:28, :1261); minority odd sizes
    m = i % 10
    if m < 6:
        return 396
    if m < 9:
        return 290
    return 64 + (i * 53) % 449  # 64..512


def build_images_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    lons = rng.uniform(-179.9, 179.9, n)
    lats = rng.uniform(-84.9, 84.9, n)
    rows = []
    for i in range(n):
        w = h = _size_for(i)
        fmt = "png" if i % 2 == 0 else "jpeg"
        img = image_pixels(i, w, h)
        data = encode_image(img, fmt)
        scene = i % 7
        z = 4 + i % 5
        x = (i * 11) % (1 << z)
        y = (i * 13) % (1 << z)
        mode = MODES[i % 4]
        caption = f"scene {scene} tile z{z}/x{x}/y{y} variant {mode}"
        rows.append(
            (
                f"img{i:010d}",
                data,
                w,
                h,
                fmt,
                caption,
                phash64(img),
                float(lons[i]),
                float(lats[i]),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "lon", "lat"],
    )


def images_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    pdf = build_images_pdf(n, seed)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    rows = [(a, bytearray(b), int(c), int(d), e, f, int(g), float(x), float(y))
            for a, b, c, d, e, f, g, x, y in rows]
    return spark.createDataFrame(rows, IMAGE_SCHEMA)


def pipeline_corpus_df(
    spark: SparkSession, n: int, w: int = 48, h: int = 48
) -> DataFrame:
    """Distributed input_hint corpus for the TRAINING pipeline
    (pipeline.training_data_pipeline) with PLANTED curation events, all
    a pure function of the row index:

    - ``i % 10 == 9``  → exact caption duplicate of row i-1 (distinct
      pixels, same caption — caught by exact caption dedup);
    - ``i % 13 == 12`` → phash near-duplicate of row i-1: a jpeg row
      carrying i-1's pixels and a phash with 2 flipped bits (hamming 2
      — caught by dedup_images; jpeg rows skip the exact-phash verify
      by contract, so the planted hash survives decode_verify);
    - ``i % 17 == 16`` → dims-corrupt row (the ``w`` column lies by 1)
      that decode_verify must drop;
    - ``i % 4 == 3``   → jpeg rows are PROGRESSIVE (SOF2) streams;
      the rest alternate png / baseline jpeg.

    Generated on the EXECUTORS (mapInPandas over spark.range) — no
    driver-side encode bottleneck, so bench-scale corpora are cheap.
    """
    import pandas as pd

    from ..raster.jpeg import encode_progressive_jpeg

    def salted_pixels(j: int) -> np.ndarray:
        # image_pixels shares a dominant gradient across rows, which
        # makes UNRELATED images phash-collide en masse; add a
        # deterministic per-image dither so natural near-dups are rare
        # and the dedup stages measure the PLANTED events
        img = image_pixels(j, w, h).copy()
        # COARSE blocks (phash is low-frequency: fine dither averages
        # away; 12px blocks land squarely in the hash's DCT band)
        by = np.arange(h)[:, None] // 12
        bx = np.arange(w)[None, :] // 12
        rr = (by * 131 + bx * 197 + j * 911) % 251
        for c in range(3):
            img[:, :, c] = (
                (img[:, :, c].astype(np.int64) + (rr * (c + 3)) % 173) % 256
            ).astype(np.uint8)
        return img

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                pix_src = i - 1 if (i % 13 == 12 and i > 0) else i
                img = salted_pixels(pix_src)
                fmt = "png" if i % 2 == 0 else "jpeg"
                if i % 13 == 12:
                    fmt = "jpeg"  # skips exact-phash verify by contract
                if fmt == "jpeg" and i % 4 == 3:
                    data = encode_progressive_jpeg(img, 90, "444")
                else:
                    data = encode_image(img, fmt)
                ph = phash64(img)  # img IS salted_pixels(pix_src)
                if i % 13 == 12:
                    # flip 2 distinct bits via the two's-complement view
                    # (ph may be negative: mask to 64 bits, xor, re-sign)
                    u = (ph & ((1 << 64) - 1)) ^ (
                        (1 << (i % 60)) | (1 << ((i * 7 + 11) % 60))
                    )
                    ph = u - (1 << 64) if u >= 1 << 63 else u
                cap_src = i - 1 if (i % 10 == 9 and i > 0) else i
                caption = (
                    f"scene {cap_src % 7} tile z{4 + cap_src % 5} "
                    f"variant {MODES[cap_src % 4]} row {cap_src}"
                )
                w_claim = w + 1 if i % 17 == 16 else w
                rows.append(
                    (f"img{i:010d}", data, w_claim, h, fmt, caption, ph)
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    return spark.range(0, n).mapInPandas(
        gen,
        schema=(
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long"
        ),
    )

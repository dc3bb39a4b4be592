"""EXIF metadata: hand-assembled TIFF streams (independent of the
writer), build/parse round-trips in both byte orders, GPS scrubbing
byte-surgery guarantees, and the Spark operators."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm_render_spark.raster import exif as E
from osm_render_spark.raster.jpeg import decode_jpeg, encode_jpeg


def _img(seed: int = 7, h: int = 32, w: int = 40) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def _sample_exif(endian: str) -> E.Exif:
    ex = E.Exif(endian)
    ex.ifds["0th"] = {
        E.TAG_MAKE: (E.ASCII, "TestCam"),
        E.TAG_ORIENTATION: (E.SHORT, [6]),
        E.TAG_DATETIME: (E.ASCII, "2026:08:17 12:00:00"),
        0x9999: (E.UNDEFINED, b"\x01\x02\x03\x04\x05"),  # unknown tag
    }
    ex.ifds["exif"] = {0xA002: (E.LONG, [40]), 0xA003: (E.LONG, [32])}
    ex.ifds["gps"] = E.make_gps_ifd(
        ((37, 1), (46, 1), (3012, 100)), "N",
        ((122, 1), (25, 1), (990, 100)), "W",
    )
    return ex


def test_hand_assembled_stream_parses():
    # Big-endian TIFF assembled with raw struct calls — the parser is
    # validated against the published layout, not against serialize_tiff.
    # 0th IFD at 8: two entries (Orientation inline SHORT; GPS pointer),
    # next-IFD 0; GPS IFD with an out-of-line RATIONAL*3 latitude.
    gps_off = 8 + 2 + 2 * 12 + 4
    lat_off = gps_off + 2 + 3 * 12 + 4
    buf = b"MM" + struct.pack(">HI", 42, 8)
    buf += struct.pack(">H", 2)
    buf += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 8) + b"\x00\x00"
    buf += struct.pack(">HHI", 0x8825, 4, 1) + struct.pack(">I", gps_off)
    buf += struct.pack(">I", 0)
    assert len(buf) == gps_off
    buf += struct.pack(">H", 3)
    buf += struct.pack(">HHI", 0x0001, 2, 2) + b"N\x00\x00\x00"
    buf += struct.pack(">HHI", 0x0002, 5, 3) + struct.pack(">I", lat_off)
    buf += struct.pack(">HHI", 0x0003, 2, 2) + b"E\x00\x00\x00"
    buf += struct.pack(">I", 0)
    assert len(buf) == lat_off
    buf += struct.pack(">IIIIII", 51, 1, 30, 1, 0, 1)

    ex = E.parse_tiff(buf)
    assert ex.endian == ">"
    assert ex.ifds["0th"][0x0112] == (3, [8])
    gps = ex.ifds["gps"]
    assert gps[0x0001][1] == "N"
    assert gps[0x0002][1] == [(51, 1), (30, 1), (0, 1)]
    # inline values must be LEFT-justified in the 4-byte field: the
    # big-endian SHORT 8 above sits in the first two bytes.


@pytest.mark.parametrize("endian", ["<", ">"])
def test_build_parse_roundtrip(endian):
    tiff = E.serialize_tiff(_sample_exif(endian))
    ex = E.parse_tiff(tiff)
    assert ex.ifds["0th"][E.TAG_MAKE][1] == "TestCam"
    assert ex.ifds["0th"][E.TAG_ORIENTATION] == (E.SHORT, [6])
    assert ex.ifds["0th"][0x9999][1] == b"\x01\x02\x03\x04\x05"
    assert ex.ifds["exif"][0xA002] == (E.LONG, [40])
    lat, lon = E.gps_degrees(ex.ifds["gps"])
    assert lat == pytest.approx(37 + 46 / 60 + 30.12 / 3600)
    assert lon == pytest.approx(-(122 + 25 / 60 + 9.90 / 3600))
    # writer is deterministic and parse→serialize is a fixpoint
    assert E.serialize_tiff(E.parse_tiff(tiff)) == tiff


def test_signed_and_srational_types():
    ex = E.Exif("<")
    ex.ifds["0th"] = {
        0x0100: (9, [-5, 7]),                       # SLONG
        0x0101: (E.SRATIONAL, [(-72, 10)]),         # ExposureBias-style
        0x0102: (8, [-3]),                          # SSHORT
    }
    got = E.parse_tiff(E.serialize_tiff(ex)).ifds["0th"]
    assert got[0x0100] == (9, [-5, 7])
    assert got[0x0101] == (E.SRATIONAL, [(-72, 10)])
    assert got[0x0102] == (8, [-3])


def test_thumbnail_roundtrip():
    thumb = encode_jpeg(_img(3, 16, 16), 70)
    ex = _sample_exif("<")
    ex.ifds["1st"] = {E.TAG_ORIENTATION: (E.SHORT, [1])}
    ex.thumbnail = thumb
    ex2 = E.parse_tiff(E.serialize_tiff(ex))
    assert ex2.thumbnail == thumb
    assert ex2.ifds["1st"][E.TAG_ORIENTATION] == (E.SHORT, [1])
    # thumbnail survives a GPS scrub rewrite
    jp = E.insert_exif(encode_jpeg(_img(), 85), E.serialize_tiff(ex))
    out, removed = E.strip_gps(jp)
    assert removed
    ex3 = E.parse_tiff(E.find_exif_app1(out)[2])
    assert ex3.thumbnail == thumb and "gps" not in ex3.ifds


@pytest.mark.parametrize("endian", ["<", ">"])
def test_strip_gps_byte_surgery(endian):
    jp = encode_jpeg(_img(), 85, "420", restart_interval=4)
    tagged = E.insert_exif(jp, E.serialize_tiff(_sample_exif(endian)))
    out, removed = E.strip_gps(tagged)
    assert removed
    # only the APP1 segment changed: removing it from both sides must
    # recover the identical original JPEG byte stream
    assert E.strip_exif(tagged)[0] == jp
    assert E.strip_exif(out)[0] == jp
    # decoded pixels bit-identical; other metadata intact
    assert (decode_jpeg(out) == decode_jpeg(tagged)).all()
    ex = E.parse_tiff(E.find_exif_app1(out)[2])
    assert "gps" not in ex.ifds and E.TAG_GPS_IFD not in ex.ifds["0th"]
    assert ex.ifds["0th"][E.TAG_MAKE][1] == "TestCam"
    assert ex.ifds["0th"][0x9999][1] == b"\x01\x02\x03\x04\x05"
    # idempotent, and the no-op path returns the SAME object (no copy
    # of a 100 MB blob when there is nothing to do)
    again, r2 = E.strip_gps(out)
    assert not r2 and again is out


def test_strip_noops():
    jp = encode_jpeg(_img(), 85)
    out, removed = E.strip_gps(jp)          # no Exif at all
    assert not removed and out is jp
    ex = _sample_exif("<")
    del ex.ifds["gps"]
    tagged = E.insert_exif(jp, E.serialize_tiff(ex))
    out, removed = E.strip_gps(tagged)      # Exif but no GPS
    assert not removed and out is tagged


def test_insert_replaces_existing():
    jp = encode_jpeg(_img(), 85)
    a = E.insert_exif(jp, E.serialize_tiff(_sample_exif("<")))
    b = E.insert_exif(a, E.serialize_tiff(_sample_exif(">")))
    assert E.parse_tiff(E.find_exif_app1(b)[2]).endian == ">"
    assert E.strip_exif(b)[0] == jp


def test_corrupt_streams_raise():
    with pytest.raises(ValueError):
        E.parse_tiff(b"XX\x00\x2a\x00\x00\x00\x08")
    with pytest.raises(ValueError):  # bad magic
        E.parse_tiff(b"II\x2b\x00\x08\x00\x00\x00")
    with pytest.raises(ValueError):  # IFD offset past the end
        E.parse_tiff(b"II\x2a\x00\xff\x00\x00\x00")
    # value offset out of bounds
    buf = b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", 1)
    buf += struct.pack("<HHI", 0x0002, 5, 3) + struct.pack("<I", 9999)
    buf += struct.pack("<I", 0)
    with pytest.raises(ValueError):
        E.parse_tiff(buf)
    # self-referencing IFD chain must not loop forever
    loop = b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", 0)
    loop += struct.pack("<I", 8)
    with pytest.raises(ValueError):
        E.parse_tiff(loop)


def test_jpeg_dimensions_probe():
    for h, w, sub in ((32, 40, "444"), (33, 41, "420")):
        jp = encode_jpeg(_img(1, h, w), 80, sub)
        assert E.jpeg_dimensions(jp) == (w, h, 3)
    gray = encode_jpeg(_img(2)[:, :, 0], 80)
    assert E.jpeg_dimensions(gray) == (40, 32, 1)
    with pytest.raises(ValueError):
        E.jpeg_dimensions(b"\x00\x01")


def test_apply_orientation_all_eight():
    from osm_render_spark.raster.exif import apply_orientation

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    # known mappings on a 2x3 grid, checked via the top-left pixel's
    # destination and output dims
    assert (apply_orientation(img, 1) == img).all()
    assert (apply_orientation(img, 2) == img[:, ::-1]).all()
    assert (apply_orientation(img, 3) == img[::-1, ::-1]).all()
    assert (apply_orientation(img, 4) == img[::-1]).all()
    for o in (5, 6, 7, 8):
        out = apply_orientation(img, o)
        assert out.shape == (3, 2, 3)
    # rot90-CW check: camera "rotated left" tag 6 puts the top-left
    # pixel at the top-right
    assert (apply_orientation(img, 6)[0, -1] == img[0, 0]).all()
    assert (apply_orientation(img, 8)[-1, 0] == img[0, 0]).all()
    # every orientation composed with its inverse is the identity
    inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    for o, inv in inverse.items():
        assert (apply_orientation(apply_orientation(img, o), inv) == img).all()
    # grayscale path
    g = img[:, :, 0]
    assert apply_orientation(g, 6).shape == (3, 2)
    with pytest.raises(ValueError):
        apply_orientation(img, 9)


def _image_df(spark, n=12):
    rows = []
    for k in range(n):
        jp = encode_jpeg(_img(k), 80)
        if k % 3 == 0:  # GPS-tagged
            ex = _sample_exif("<" if k % 2 else ">")
            ex.ifds["gps"] = E.make_gps_ifd(
                ((k, 1), (30, 1), (0, 1)), "N" if k % 2 else "S",
                ((2 * k, 1), (15, 1), (0, 1)), "E" if k % 2 else "W",
            )
            jp = E.insert_exif(jp, E.serialize_tiff(ex))
        elif k % 3 == 1:  # Exif, no GPS
            ex = _sample_exif("<")
            del ex.ifds["gps"]
            jp = E.insert_exif(jp, E.serialize_tiff(ex))
        rows.append((f"img{k:03d}", bytearray(jp)))
    return spark.createDataFrame(rows, "image_id string, bytes binary")


def test_image_metadata_operator(spark):
    got = {r["image_id"]: r for r in E.image_metadata(_image_df(spark)).collect()}
    assert len(got) == 12
    for k in range(12):
        r = got[f"img{k:03d}"]
        assert (r["w"], r["h"]) == (40, 32) and r["exif_ok"] == 1
        if k % 3 == 0:
            sign = 1 if k % 2 else -1
            assert r["has_gps"] == 1
            assert r["lat_e7"] == int(np.floor(sign * (k + 0.5) * 1e7 + 0.5))
            assert r["lon_e7"] == int(np.floor(sign * (2 * k + 0.25) * 1e7 + 0.5))
        else:
            assert r["has_gps"] == 0 and r["lat_e7"] is None
        assert (r["orientation"] == 6) == (k % 3 != 2)


def test_scrub_operator_and_corrupt_passthrough(spark):
    df = _image_df(spark)
    rows = [(r["image_id"], bytes(r["bytes"]), r["removed"])
            for r in E.scrub_image_gps(df).collect()]
    assert sorted(r[2] for r in rows) == [0] * 8 + [1] * 4
    meta = {r["image_id"]: r for r in E.image_metadata(
        spark.createDataFrame([(i, bytearray(b)) for i, b, _ in rows],
                              "image_id string, bytes binary")).collect()}
    assert all(m["has_gps"] == 0 for m in meta.values())
    assert all(m["exif_ok"] == 1 for m in meta.values())
    # a non-JPEG poison blob passes through unmodified, not crashing
    poison = spark.createDataFrame(
        [("bad", bytearray(b"\x00\x01garbage"))], "image_id string, bytes binary"
    )
    out = E.scrub_image_gps(poison).collect()
    assert out[0]["removed"] == 0 and bytes(out[0]["bytes"]) == b"\x00\x01garbage"

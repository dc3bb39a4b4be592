"""GeoTIFF codec — from-scratch classic-TIFF 6.0 reader/writer with the
GeoTIFF georeferencing tags, no image library.

Role in the engine: the geospatial raster SOURCE the reference's slippy
pipeline implies but delegates to system decoders (S8 delegate decode,
OsmRender.m:101-135 loads pre-rendered rasters through a library; the
survey scopes raster IO as engine-owned here).  A GeoTIFF is the
interchange format for elevation/land-cover grids; this module turns one
into the engine's tile rows so terrain derivatives (raster/terrain.py)
and the existing tile-pyramid/PNG sinks can run distributed over it.

Implemented from the public specs only (Adobe TIFF 6.0, 1992; OGC
GeoTIFF 1.1):

- classic TIFF (both byte orders), single IFD, chunky planar config
- strip AND tile organization, padded edge segments per spec
- compression: 1 none, 5 LZW (TIFF variant: MSB-first bits, early
  code-width change), 8 Deflate (zlib), 32773 PackBits
- predictor 2 (horizontal differencing) on integer samples
- samples: gray u8/u16/i16/u32/i32/f32/f64 and RGB u8
- geo tags: ModelPixelScale (33550), ModelTiepoint (33922),
  GeoKeyDirectory (34735) — geographic CRS key only

The writer emits everything the reader accepts, so tests round-trip
real files (and hand-crafted adversarial streams decode against
in-test textbook references, the JPEG/FLAC/LZ4/zstd discipline).

Scale note: decode is whole-array numpy per segment inside Arrow
batches; the parallel unit is the file/segment row, never the pixel.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

# TIFF tag ids (public spec numbering)
T_WIDTH = 256
T_LENGTH = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SAMPLES = 277
T_ROWS_PER_STRIP = 278
T_STRIP_COUNTS = 279
T_PLANAR = 284
T_PREDICTOR = 317
T_TILE_W = 322
T_TILE_H = 323
T_TILE_OFFSETS = 324
T_TILE_COUNTS = 325
T_SAMPLE_FMT = 339
T_PIXEL_SCALE = 33550
T_TIEPOINT = 33922
T_GEO_KEYS = 34735

# field type -> (struct char, byte size); rationals handled specially
_TYPES = {
    1: ("B", 1),   # BYTE
    2: ("c", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    5: (None, 8),  # RATIONAL
    6: ("b", 1),   # SBYTE
    8: ("h", 2),   # SSHORT
    9: ("i", 4),   # SLONG
    10: (None, 8),  # SRATIONAL
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
}


@dataclass(frozen=True)
class GeoRef:
    """Affine georeference from ModelTiepoint + ModelPixelScale:
    lon(px) = origin_lon + px*scale_x ; lat(py) = origin_lat - py*scale_y
    (tiepoint normalized to pixel (0,0) at parse time)."""

    origin_lon: float
    origin_lat: float
    scale_x: float
    scale_y: float
    crs: str = "EPSG:4326"

    def to_lonlat(self, px: float, py: float) -> tuple[float, float]:
        return (self.origin_lon + px * self.scale_x,
                self.origin_lat - py * self.scale_y)

    def bbox(self, w: int, h: int) -> tuple[float, float, float, float]:
        """(min_lon, min_lat, max_lon, max_lat) of the pixel grid."""
        lon1, lat0 = self.to_lonlat(w, h)
        lon0, lat1 = self.to_lonlat(0, 0)
        return (lon0, lat0, lon1, lat1)


# ---------------------------------------------------------------- LZW

def lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, clear=256 eoi=257,
    9-bit start, EARLY code-width change (width bumps when the NEXT
    entry to be added would need it, i.e. at table sizes 510/1022/2046
    — TIFF 6.0 spec p.61)."""
    out = bytearray()
    # table as list of bytes; rebuilt on clear
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    buf = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            buf = (buf << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = buf >> nbits
        buf &= (1 << nbits) - 1  # keep the residue small (bigint trap)
        if code == 256:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == 257:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        # early change (libtiff convention), seen from the decoder: the
        # decoder's table is one add BEHIND the encoder's (it adds for
        # code m only while decoding code m+1), so it must widen at
        # 2^width - 2 entries to read the encoder's first wider code
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-variant LZW encoder matching lzw_decode_tiff (early change)."""
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append(buf >> nbits)
            buf &= (1 << nbits) - 1  # keep the residue small (bigint trap)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # early change mirror of the decoder: table size == next_code
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # keep headroom, then reset (spec allows)
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(257, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


# ----------------------------------------------------------- PackBits

def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < expected:
        h = data[pos]
        pos += 1
        if h < 128:
            out += data[pos : pos + h + 1]
            pos += h + 1
        elif h > 128:
            out += bytes([data[pos]]) * (257 - h)
            pos += 1
        # 128 = no-op per spec
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i), data[i]])
            i = j
        else:
            # literal run until next >=3 repeat or 128 cap
            j = i + 1
            while j < n and j - i < 128:
                if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


# ------------------------------------------------------------- reader

def _read_ifd(data: bytes, bo: str, off: int) -> dict[int, list]:
    (count,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, list] = {}
    for i in range(count):
        eo = off + 2 + 12 * i
        tag, ftype, n = struct.unpack_from(bo + "HHI", data, eo)
        if ftype not in _TYPES:
            continue
        ch, size = _TYPES[ftype]
        total = size * n
        if total <= 4:
            voff = eo + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", data, eo + 8)
        if ftype in (5, 10):  # (S)RATIONAL
            ich = "i" if ftype == 10 else "I"
            vals = []
            for k in range(n):
                num, den = struct.unpack_from(bo + 2 * ich, data, voff + 8 * k)
                vals.append(num / den if den else 0.0)
        elif ftype == 2:
            vals = [data[voff : voff + n].split(b"\0")[0].decode("ascii", "replace")]
        else:
            vals = list(struct.unpack_from(bo + str(n) + ch, data, voff))
        tags[tag] = vals
    return tags


def _dtype_for(bits: int, fmt: int, bo: str) -> np.dtype:
    e = "<" if bo == "<" else ">"
    if fmt == 3:
        if bits == 32:
            return np.dtype(e + "f4")
        if bits == 64:
            return np.dtype(e + "f8")
        raise ValueError(f"float samples must be 32/64-bit, got {bits}")
    kind = "i" if fmt == 2 else "u"
    if bits not in (8, 16, 32):
        raise ValueError(f"unsupported BitsPerSample {bits}")
    return np.dtype(e + kind + str(bits // 8))


def decode_geotiff(data: bytes) -> tuple[np.ndarray, GeoRef | None]:
    """Parse a classic TIFF; returns (array[h,w] or [h,w,3], georef).
    Georef is None when the geo tags are absent (plain TIFF)."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack_from(bo + "HI", data, 2)
    if magic == 43:
        raise NotImplementedError("BigTIFF (magic 43) not supported")
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic}")
    tags = _read_ifd(data, bo, ifd_off)

    w = int(tags[T_WIDTH][0])
    h = int(tags[T_LENGTH][0])
    spp = int(tags.get(T_SAMPLES, [1])[0])
    bits_l = tags.get(T_BITS, [8])
    if len(set(bits_l)) != 1:
        raise NotImplementedError("heterogeneous BitsPerSample")
    bits = int(bits_l[0])
    comp = int(tags.get(T_COMPRESSION, [1])[0])
    pred = int(tags.get(T_PREDICTOR, [1])[0])
    fmt = int(tags.get(T_SAMPLE_FMT, [1])[0])
    if int(tags.get(T_PLANAR, [1])[0]) != 1:
        raise NotImplementedError("planar (non-chunky) TIFF")
    if spp not in (1, 3):
        raise NotImplementedError(f"SamplesPerPixel {spp}")
    dt = _dtype_for(bits, fmt, bo)
    bpp = dt.itemsize * spp

    tiled = T_TILE_OFFSETS in tags
    if tiled:
        sw, sh = int(tags[T_TILE_W][0]), int(tags[T_TILE_H][0])
        offsets = tags[T_TILE_OFFSETS]
        counts = tags[T_TILE_COUNTS]
        across = (w + sw - 1) // sw
    else:
        sw = w
        sh = int(tags.get(T_ROWS_PER_STRIP, [h])[0])
        offsets = tags[T_STRIP_OFFSETS]
        counts = tags[T_STRIP_COUNTS]
        across = 1

    img = np.zeros((h, w, spp), dtype=dt.newbyteorder("="))
    for idx, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = data[int(off) : int(off) + int(cnt)]
        if tiled:
            seg_h = sh
            y0 = (idx // across) * sh
            x0 = (idx % across) * sw
        else:
            y0 = idx * sh
            x0 = 0
            seg_h = min(sh, h - y0)
        expected = sw * seg_h * bpp
        if comp == 1:
            plain = raw[:expected]
        elif comp == 5:
            plain = lzw_decode_tiff(raw, expected)
        elif comp == 8 or comp == 32946:
            plain = zlib.decompress(raw)
        elif comp == 32773:
            plain = packbits_decode(raw, expected)
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
        if len(plain) < expected:
            plain = plain + b"\0" * (expected - len(plain))
        seg = np.frombuffer(plain[:expected], dtype=dt).reshape(seg_h, sw, spp)
        if pred == 2:
            seg = np.cumsum(seg.astype(np.int64), axis=1, dtype=np.int64)
            seg = seg.astype(dt)  # wraparound per spec
        cw = min(sw, w - x0)
        ch = min(seg_h, h - y0)
        img[y0 : y0 + ch, x0 : x0 + cw] = seg[:ch, :cw]

    georef = None
    if T_TIEPOINT in tags and T_PIXEL_SCALE in tags:
        tp = tags[T_TIEPOINT]
        sx, sy = float(tags[T_PIXEL_SCALE][0]), float(tags[T_PIXEL_SCALE][1])
        ix, iy, lon, lat = float(tp[0]), float(tp[1]), float(tp[3]), float(tp[4])
        crs = "EPSG:4326"
        gk = tags.get(T_GEO_KEYS)
        if gk:
            # GeoKeyDirectory: header of 4 shorts then 4-short key entries;
            # key 3072 ProjectedCSType / 2048 GeographicType carry the EPSG
            for k in range(4, len(gk) - 3, 4):
                if gk[k] in (2048, 3072) and gk[k + 1] == 0:
                    crs = f"EPSG:{int(gk[k + 3])}"
        georef = GeoRef(lon - ix * sx, lat + iy * sy, sx, sy, crs)
    return (img[:, :, 0] if spp == 1 else img), georef


# ------------------------------------------------------------- writer

def encode_geotiff(
    img: np.ndarray,
    *,
    georef: GeoRef | None = None,
    compression: str = "deflate",
    tile: tuple[int, int] | None = None,
    rows_per_strip: int = 64,
    predictor: int = 1,
) -> bytes:
    """Write a classic little-endian (Geo)TIFF the reader round-trips.
    compression: none | deflate | lzw | packbits.  tile=(tw,th) emits a
    tiled layout (multiples of 16 per spec), else strips."""
    if img.ndim == 2:
        arr = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        arr = img
    else:
        raise ValueError("image must be [h,w] or [h,w,3]")
    h, w, spp = arr.shape
    dt = arr.dtype
    if dt.kind == "f":
        fmt, bits = 3, dt.itemsize * 8
    elif dt.kind == "i":
        fmt, bits = 2, dt.itemsize * 8
    elif dt.kind == "u":
        fmt, bits = 1, dt.itemsize * 8
    else:
        raise ValueError(f"unsupported dtype {dt}")
    if predictor == 2 and fmt == 3:
        raise ValueError("predictor 2 is integer-only")
    arr = np.ascontiguousarray(arr, dtype=dt.newbyteorder("<"))

    comp_id = {"none": 1, "deflate": 8, "lzw": 5, "packbits": 32773}[compression]

    # split into segments (padded at right/bottom edges for tiles)
    segs: list[np.ndarray] = []
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("tile dims must be multiples of 16")
        for y0 in range(0, h, th):
            for x0 in range(0, w, tw):
                seg = np.zeros((th, tw, spp), dtype=arr.dtype)
                blk = arr[y0 : y0 + th, x0 : x0 + tw]
                seg[: blk.shape[0], : blk.shape[1]] = blk
                segs.append(seg)
    else:
        for y0 in range(0, h, rows_per_strip):
            segs.append(arr[y0 : y0 + rows_per_strip])

    payloads: list[bytes] = []
    for seg in segs:
        if predictor == 2:
            s64 = seg.astype(np.int64)
            s64[:, 1:] -= s64[:, :-1].copy()
            seg = s64.astype(arr.dtype)
        raw = seg.tobytes()
        if comp_id == 1:
            payloads.append(raw)
        elif comp_id == 8:
            payloads.append(zlib.compress(raw, 6))
        elif comp_id == 5:
            payloads.append(lzw_encode_tiff(raw))
        else:
            payloads.append(packbits_encode(raw))

    # data section first (offset 8), IFD after
    data = bytearray()
    seg_offsets: list[int] = []
    for p in payloads:
        seg_offsets.append(8 + len(data))
        data += p
        if len(data) & 1:
            data += b"\0"

    entries: list[tuple[int, int, int, bytes | int]] = []  # tag,type,count,val
    extra = bytearray()  # out-of-line values, placed after the IFD

    def add(tag: int, ftype: int, values: list) -> None:
        ch, size = _TYPES[ftype]
        n = len(values)
        if ftype == 12:
            packed = struct.pack("<" + "d" * n, *values)
        else:
            packed = struct.pack("<" + str(n) + ch, *values)
        if len(packed) <= 4:
            entries.append((tag, ftype, n, packed.ljust(4, b"\0")))
        else:
            entries.append((tag, ftype, n, len(extra)))  # patched later
            extra.extend(packed)
            if len(extra) & 1:
                extra.append(0)

    add(T_WIDTH, 4, [w])
    add(T_LENGTH, 4, [h])
    add(T_BITS, 3, [bits] * spp)
    add(T_COMPRESSION, 3, [comp_id])
    add(T_PHOTOMETRIC, 3, [2 if spp == 3 else 1])
    if tile is not None:
        add(T_TILE_W, 3, [tile[0]])
        add(T_TILE_H, 3, [tile[1]])
        add(T_TILE_OFFSETS, 4, seg_offsets)
        add(T_TILE_COUNTS, 4, [len(p) for p in payloads])
    else:
        add(T_STRIP_OFFSETS, 4, seg_offsets)
        add(T_ROWS_PER_STRIP, 3, [rows_per_strip])
        add(T_STRIP_COUNTS, 4, [len(p) for p in payloads])
    add(T_SAMPLES, 3, [spp])
    if predictor != 1:
        add(T_PREDICTOR, 3, [predictor])
    add(T_SAMPLE_FMT, 3, [fmt] * spp)
    if georef is not None:
        add(T_PIXEL_SCALE, 12, [georef.scale_x, georef.scale_y, 0.0])
        add(T_TIEPOINT, 12,
            [0.0, 0.0, 0.0, georef.origin_lon, georef.origin_lat, 0.0])
        epsg = int(georef.crs.split(":")[1]) if ":" in georef.crs else 4326
        # minimal GeoKeyDirectory: version 1.1.0, 2 keys:
        # GTModelType=2 (geographic), GeographicType=epsg
        add(T_GEO_KEYS, 3,
            [1, 1, 0, 2, 1024, 0, 1, 2, 2048, 0, 1, epsg])

    entries.sort(key=lambda e: e[0])
    ifd_off = 8 + len(data)
    ifd_size = 2 + 12 * len(entries) + 4
    extra_base = ifd_off + ifd_size

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += data
    out += struct.pack("<H", len(entries))
    for tag, ftype, n, val in entries:
        out += struct.pack("<HHI", tag, ftype, n)
        if isinstance(val, int):  # offset into extra
            out += struct.pack("<I", extra_base + val)
        else:
            out += val
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    return bytes(out)

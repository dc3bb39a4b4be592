"""Raster kernels (SURVEY.md §2.9 R1-R12) — pure numpy, Arrow-batch-friendly.

The reference rasterizes via Cairo (fills OsmRender.m:495-517, strokes
:521-529, DEST_OUT :523,531,659, masks :718-719, blits :635-639, diffs
:1255-1256, atlas :1259). These kernels re-express the semantics
(aliased, deterministic — the engine's goldens are produced by the same
rules, and the PSNR≥40dB budget absorbs AA differences vs Cairo).

Surfaces are (h, w, 4) uint8 RGBA with straight (non-premultiplied)
alpha. Polygon fill uses the even-odd rule sampled at pixel centers —
the same ray-cast kernel as the PIP operator (operators.pip), so fill
and point-in-polygon share one semantic definition.
"""

from __future__ import annotations

import numpy as np

from ..operators.pip import raycast_even_odd


def new_surface(w: int, h: int, rgba: tuple[int, int, int, int] = (0, 0, 0, 0)) -> np.ndarray:
    """R1: create a surface (ARGB32-equivalent: RGBA uint8)."""
    s = np.empty((h, w, 4), dtype=np.uint8)
    s[:, :] = rgba
    return s


def unpack_argb(color: int) -> tuple[int, int, int, int]:
    """R12: packed 0xAARRGGBB -> (r, g, b, a)."""
    a = (color >> 24) & 0xFF
    r = (color >> 16) & 0xFF
    g = (color >> 8) & 0xFF
    b = color & 0xFF
    return (r, g, b, a)


def _coverage_mask(w: int, h: int, polys: list[np.ndarray]) -> np.ndarray:
    """Even-odd coverage of a poly-polygon at pixel centers (h, w) bool.

    Multiple sub-paths accumulate into ONE even-odd fill — the reference's
    poly-polygon fill (coast rings accumulated then filled once,
    OsmRender.m:495-504): a point is covered iff its total crossing count
    over ALL sub-paths is odd.

    Each sub-path only ray-casts the pixels inside its own bbox window
    (outside the bbox the crossing parity is always even), so dense tiles
    with many small polygons cost O(Σ poly_bbox_area) instead of
    O(n_polys × tile_area). Semantics unchanged.
    """
    parity = np.zeros((h, w), dtype=bool)
    for poly in polys:
        poly = np.asarray(poly, dtype=np.float64)
        if len(poly) < 3:
            continue
        x0 = max(0, int(np.floor(poly[:, 0].min() - 0.5)))
        x1 = min(w, int(np.ceil(poly[:, 0].max() + 0.5)))
        y0 = max(0, int(np.floor(poly[:, 1].min() - 0.5)))
        y1 = min(h, int(np.ceil(poly[:, 1].max() + 0.5)))
        if x0 >= x1 or y0 >= y1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1]
        px = (xx + 0.5).ravel()
        py = (yy + 0.5).ravel()
        parity[y0:y1, x0:x1] ^= raycast_even_odd(
            px, py, poly[:, 0], poly[:, 1]
        ).reshape(y1 - y0, x1 - x0)
    return parity


def fill_polygon(
    surface: np.ndarray, polys: list[np.ndarray], color: tuple[int, int, int, int]
) -> None:
    """R2: even-odd poly-polygon fill, OVER compositing, in place."""
    mask = _coverage_mask(surface.shape[1], surface.shape[0], polys)
    _blend_over(surface, mask, color)


def stroke_polyline(
    surface: np.ndarray,
    path: np.ndarray,
    width: float,
    color: tuple[int, int, int, int],
    erase: bool = False,
) -> None:
    """R3 (+R4 when erase): stroke with round caps/joins = distance-to-
    segment ≤ width/2 at pixel centers. erase=True applies DEST_OUT
    (bridges cut out of water, OsmRender.m:519-531)."""
    h, w = surface.shape[:2]
    path = np.asarray(path, dtype=np.float64)
    mask = np.zeros((h, w), dtype=bool)
    r = width / 2.0
    for i in range(len(path) - 1):
        x1, y1 = path[i]
        x2, y2 = path[i + 1]
        lo_x = max(0, int(np.floor(min(x1, x2) - r - 1)))
        hi_x = min(w, int(np.ceil(max(x1, x2) + r + 1)))
        lo_y = max(0, int(np.floor(min(y1, y2) - r - 1)))
        hi_y = min(h, int(np.ceil(max(y1, y2) + r + 1)))
        if lo_x >= hi_x or lo_y >= hi_y:
            continue
        yy, xx = np.mgrid[lo_y:hi_y, lo_x:hi_x]
        px = xx + 0.5
        py = yy + 0.5
        dx, dy = x2 - x1, y2 - y1
        seg2 = dx * dx + dy * dy
        if seg2 == 0:
            d2 = (px - x1) ** 2 + (py - y1) ** 2
        else:
            t = ((px - x1) * dx + (py - y1) * dy) / seg2
            t = np.clip(t, 0.0, 1.0)
            d2 = (px - (x1 + t * dx)) ** 2 + (py - (y1 + t * dy)) ** 2
        mask[lo_y:hi_y, lo_x:hi_x] |= d2 <= r * r
    if erase:
        dest_out(surface, mask)
    else:
        _blend_over(surface, mask, color)


def _blend_over(surface: np.ndarray, mask: np.ndarray, color: tuple[int, int, int, int]) -> None:
    """OVER with straight alpha: out = src*αs + dst*(1-αs); αo = αs + αd(1-αs)."""
    r, g, b, a = color
    if a == 0:
        return
    if a == 255:
        # opaque fast path, bit-exact with the general form (αs=1 ⇒
        # αo=1 ⇒ out=floor(src+0.5)=src): one uint8 masked store instead
        # of gather → float64 math → scatter. Map colors are opaque in
        # the common case, and the float temporaries were the raster
        # path's main memory traffic (VERDICT r2 #3).
        surface[mask] = (r, g, b, 255)
        return
    alpha_s = a / 255.0
    sel = mask
    dst = surface[sel].astype(np.float64)
    alpha_d = dst[:, 3] / 255.0
    alpha_o = alpha_s + alpha_d * (1 - alpha_s)
    src_rgb = np.array([r, g, b], dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        rgb = (src_rgb[None, :] * alpha_s + dst[:, :3] * (alpha_d * (1 - alpha_s))[:, None]) / alpha_o[
            :, None
        ]
    rgb = np.where(alpha_o[:, None] > 0, rgb, 0)
    out = np.concatenate([rgb, alpha_o[:, None] * 255.0], axis=1)
    surface[sel] = np.floor(out + 0.5).astype(np.uint8)  # F6 rounding


def dest_out(surface: np.ndarray, mask: np.ndarray) -> None:
    """R4 DEST_OUT with a full-opacity source: erase where mask."""
    surface[mask] = 0


def mask_fill(
    surface: np.ndarray, a8_mask: np.ndarray, color: tuple[int, int, int, int]
) -> None:
    """R5: paint `color` through an A8 mask (cairo_mask_surface):
    effective per-pixel alpha = color.a * mask/255."""
    r, g, b, a = color
    alpha_s = (a8_mask.astype(np.float64) / 255.0) * (a / 255.0)
    dst = surface.astype(np.float64)
    alpha_d = dst[:, :, 3] / 255.0
    alpha_o = alpha_s + alpha_d * (1 - alpha_s)
    src_rgb = np.array([r, g, b], dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        rgb = (
            src_rgb[None, None, :] * alpha_s[:, :, None]
            + dst[:, :, :3] * (alpha_d * (1 - alpha_s))[:, :, None]
        ) / alpha_o[:, :, None]
    rgb = np.where(alpha_o[:, :, None] > 0, rgb, 0)
    surface[:, :, :3] = np.floor(rgb + 0.5).astype(np.uint8)
    surface[:, :, 3] = np.floor(alpha_o * 255.0 + 0.5).astype(np.uint8)


def blit(surface: np.ndarray, src: np.ndarray, x: int, y: int) -> None:
    """R6: paint src onto surface at (x, y) with OVER."""
    h, w = surface.shape[:2]
    sh, sw = src.shape[:2]
    x0, y0 = max(0, x), max(0, y)
    x1, y1 = min(w, x + sw), min(h, y + sh)
    if x0 >= x1 or y0 >= y1:
        return
    sub = src[y0 - y : y1 - y, x0 - x : x1 - x].astype(np.float64)
    dst = surface[y0:y1, x0:x1].astype(np.float64)
    alpha_s = sub[:, :, 3:4] / 255.0
    alpha_d = dst[:, :, 3:4] / 255.0
    alpha_o = alpha_s + alpha_d * (1 - alpha_s)
    with np.errstate(invalid="ignore", divide="ignore"):
        rgb = (sub[:, :, :3] * alpha_s + dst[:, :, :3] * alpha_d * (1 - alpha_s)) / alpha_o
    rgb = np.where(alpha_o > 0, rgb, 0)
    out = np.concatenate([rgb, alpha_o * 255.0], axis=2)
    surface[y0:y1, x0:x1] = np.floor(out + 0.5).astype(np.uint8)


def diff_sprite(variant: np.ndarray, base: np.ndarray) -> np.ndarray:
    """R9/J10 (surfaceWithDifferencesFromSurface, OsmRender.m:1255-1256):
    keep variant pixels that differ from base; transparent elsewhere.

    Format limitation (inherent to diff sprites composited OVER the base,
    reference included): a pixel that changed TO fully-transparent black
    is indistinguishable from 'unchanged' in the diff. Such variants
    can't be produced by the engine's tint/label/blit variant kernels
    (they only add paint); this guard turns silent corruption into an
    error if an erase-style variant is ever diffed."""
    differs = (variant != base).any(axis=2)
    if bool((differs & (variant == 0).all(axis=2)).any()):
        raise ValueError(
            "variant contains fully-zero pixels that differ from base — "
            "not representable in a diff sprite (see docstring)"
        )
    out = np.zeros_like(variant)
    out[differs] = variant[differs]
    return out


def apply_diff(base: np.ndarray, diff: np.ndarray) -> np.ndarray:
    """Inverse of diff_sprite given the base: reconstruct the variant."""
    has = (diff != 0).any(axis=2)
    out = base.copy()
    out[has] = diff[has]
    return out


def atlas(sprites: list[np.ndarray]) -> np.ndarray:
    """R10/A5: pack sprites into one image (horizontal strip — the packing
    layout is engine-canonical; the reference's atlasFromSurfaces layout
    is opaque external code, OsmRender.m:1259)."""
    if not sprites:
        return np.zeros((1, 1, 4), dtype=np.uint8)
    h = max(s.shape[0] for s in sprites)
    w = sum(s.shape[1] for s in sprites)
    out = np.zeros((h, w, 4), dtype=np.uint8)
    x = 0
    for s in sprites:
        out[: s.shape[0], x : x + s.shape[1]] = s
        x += s.shape[1]
    return out

"""Minimal deterministic 5×7 bitmap font + label rendering (SURVEY.md R7,
R8, P12).

The reference rasterizes labels with Pango/Arial (OsmRender.m:611-622,
763-765) — no font library exists in this container, so the engine owns a
hand-defined 5×7 pixel font (A-Z, 0-9, space, dash, period). Glyphs are
engine-canonical: goldens pin them, and the PSNR≥40dB budget vs the
reference's anti-aliased text is absorbed by the comparison tolerance the
survey assigns to text (SURVEY §7.3 risk 3).

Each glyph is 7 rows × 5 bits, row-major, MSB = leftmost pixel.
"""

from __future__ import annotations

import numpy as np

_G = {
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x06, 0x08, 0x10, 0x1F),
    "3": (0x0E, 0x11, 0x01, 0x06, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    " ": (0, 0, 0, 0, 0, 0, 0),
    "-": (0, 0, 0, 0x0E, 0, 0, 0),
    ".": (0, 0, 0, 0, 0, 0x04, 0x04),
}

GLYPH_W, GLYPH_H, TRACKING = 5, 7, 1


def glyph_mask(ch: str) -> np.ndarray:
    rows = _G.get(ch.upper(), _G["-"])
    out = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    for r, bits in enumerate(rows):
        for c in range(GLYPH_W):
            if bits & (1 << (GLYPH_W - 1 - c)):
                out[r, c] = 255
    return out


def text_mask(text: str, scale: int = 1) -> np.ndarray:
    """A8 mask for a (possibly multi-line, F1) label string."""
    lines = text.split("\n")
    w = max((len(ln) * (GLYPH_W + TRACKING) - TRACKING for ln in lines), default=1)
    h = len(lines) * (GLYPH_H + 2) - 2
    mask = np.zeros((max(h, 1), max(w, 1)), dtype=np.uint8)
    for li, ln in enumerate(lines):
        y = li * (GLYPH_H + 2)
        for ci, ch in enumerate(ln):
            x = ci * (GLYPH_W + TRACKING)
            mask[y : y + GLYPH_H, x : x + GLYPH_W] = glyph_mask(ch)
    if scale > 1:
        mask = np.repeat(np.repeat(mask, scale, axis=0), scale, axis=1)
    return mask


def rounded_rect_mask(w: int, h: int, radius: int) -> np.ndarray:
    """R8 (OsmRender.m:785-794): filled rounded rectangle as an A8 mask."""
    yy, xx = np.mgrid[0:h, 0:w]
    inside = np.ones((h, w), dtype=bool)
    r = radius
    for cy, cx in ((r, r), (r, w - 1 - r), (h - 1 - r, r), (h - 1 - r, w - 1 - r)):
        corner_y = (yy < r) if cy == r else (yy > h - 1 - r)
        corner_x = (xx < r) if cx == r else (xx > w - 1 - r)
        corner = corner_y & corner_x
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        inside &= ~(corner & (d2 > r * r))
    return (inside * 255).astype(np.uint8)


def draw_label(
    surface: np.ndarray,
    text: str,
    cx: float,
    cy: float,
    color: tuple[int, int, int, int] = (20, 20, 20, 255),
    bg: tuple[int, int, int, int] | None = (255, 255, 255, 200),
    scale: int = 1,
) -> None:
    """Centered label with optional rounded-rect background, clamped into
    the surface with a 2px margin (P12, OsmRender.m:771-783). floor(x+0.5)
    positioning (F6)."""
    from .kernels import mask_fill

    h, w = surface.shape[:2]
    tm = text_mask(text, scale)
    th, tw = tm.shape
    x0 = int(np.floor(cx - tw / 2 + 0.5))
    y0 = int(np.floor(cy - th / 2 + 0.5))
    x0 = min(max(x0, 2), max(w - 2 - tw, 2))
    y0 = min(max(y0, 2), max(h - 2 - th, 2))
    if bg is not None:
        pad = 3
        bw, bh = tw + 2 * pad, th + 2 * pad
        bx, by = x0 - pad, y0 - pad
        rr = rounded_rect_mask(bw, bh, 4)
        full = np.zeros((h, w), dtype=np.uint8)
        yb0, yb1 = max(by, 0), min(by + bh, h)
        xb0, xb1 = max(bx, 0), min(bx + bw, w)
        full[yb0:yb1, xb0:xb1] = rr[yb0 - by : yb1 - by, xb0 - bx : xb1 - bx]
        mask_fill(surface, full, bg)
    full = np.zeros((h, w), dtype=np.uint8)
    y1, x1 = min(y0 + th, h), min(x0 + tw, w)
    full[y0:y1, x0:x1] = tm[: y1 - y0, : x1 - x0]
    mask_fill(surface, full, color)

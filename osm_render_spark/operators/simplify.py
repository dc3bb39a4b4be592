"""Geometry simplification (Ramer–Douglas–Peucker) — the vector-side
scale enabler for low-zoom rendering.

At z4 a 10,000-vertex coastline spans a handful of pixels; feeding it
to the per-tile render kernel (raster/ops.render_slippy_tiles) wastes
kernel time proportional to the ORIGINAL vertex count at every zoom.
Simplifying ways before the low-zoom fan-out makes per-level render
cost proportional to what is visible: with tolerance = half a pixel at
zoom z, the simplified drawing is visually indistinguishable (every
removed vertex is within eps of the kept chain) while vertex counts
drop orders of magnitude.

Spark shape: embarrassingly parallel — one Arrow batch in, one out, no
shuffle; the kernel is a vectorized numpy RDP (iterative stack, the
distance scan over each sub-chain is one vectorized cross-product, not
a per-point python loop). Classic RDP semantics: perpendicular
distance to the infinite line through the anchors, point distance when
the anchors coincide (closed rings — first == last is preserved, and a
ring entirely within eps of its anchor collapses to 2 points, which
the render kernel's len<3 guard then culls: sub-pixel features vanish,
the correct behavior).

Determinism: numpy argmax ties break to the lowest index; no floats
are compared across engines except through the oracle's integer
digest discipline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def rdp_mask(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask of the Ramer–Douglas–Peucker simplification of
    the polyline (xs, ys) at tolerance ``eps``. Endpoints always kept."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        x0, y0 = xs[i], ys[i]
        dx, dy = xs[j] - x0, ys[j] - y0
        px = xs[i + 1 : j] - x0
        py = ys[i + 1 : j] - y0
        norm2 = dx * dx + dy * dy
        # UN-squared distances: squaring first underflows for denormal
        # offsets (d=1e-308 squares to 0.0 and a point strictly off the
        # segment would be dropped at eps=0 — hypothesis catch)
        if norm2 == 0.0:
            d = np.hypot(px, py)  # degenerate anchors: point distance
        else:
            d = np.abs(px * dy - py * dx) / np.sqrt(norm2)
        m = int(np.argmax(d))
        if d[m] > eps:
            keep[i + 1 + m] = True
            stack.append((i, i + 1 + m))
            stack.append((i + 1 + m, j))
    return keep


def _merc_xy_norm(lon: np.ndarray, lat: np.ndarray):
    """Normalized Web-Mercator ([0,1) across the world) — the slippy
    render space at zoom 0; eps in these units scales to pixels as
    eps_px / (tile_px · 2^zoom)."""
    x = (lon + 180.0) / 360.0
    s = np.sin(np.radians(lat))
    y = 0.5 - np.log((1.0 + s) / (1.0 - s)) / (4.0 * np.pi)
    return x, y


def eps_for_zoom(zoom: int, tile_px: int = 256, eps_px: float = 0.5) -> float:
    """Mercator-space tolerance equal to ``eps_px`` pixels at ``zoom``."""
    return eps_px / (tile_px * (1 << zoom))


def simplify_ways(
    ways: DataFrame,
    eps: float,
    space: str = "lonlat",
    geom_col: str = "geometry",
) -> DataFrame:
    """Simplify each way's geometry with RDP at tolerance ``eps``.

    ``space="lonlat"``: distances in degrees on raw lon/lat (cheap,
    zoom-independent). ``space="mercator"``: distances in normalized
    Web-Mercator units — the render space, so ``eps =
    eps_for_zoom(z)`` bounds on-screen deviation at zoom z by half a
    pixel regardless of latitude. The MASK is computed in the chosen
    space; the emitted geometry always keeps the original lon/lat
    values (bit-identical — simplification only ever drops points).

    Output: the input columns with ``geom_col`` replaced by the
    simplified array, plus n_points_in / n_points_out.
    """
    if space not in ("lonlat", "mercator"):
        raise ValueError(f"space must be 'lonlat' or 'mercator', got {space!r}")
    from pyspark.sql import functions as F

    other = [c for c in ways.columns if c != geom_col]
    # geometry rides the kernel as two parallel float arrays (Arrow hands
    # numpy float64 straight to the kernel — no per-point dict access)
    prepared = ways.select(
        *other,
        F.transform(geom_col, lambda p: p["lon"]).alias("_lon"),
        F.transform(geom_col, lambda p: p["lat"]).alias("_lat"),
    )
    fields = ", ".join(
        f"`{c}` {ways.schema[c].dataType.simpleString()}" for c in other
    )
    kern_schema = (
        f"{fields}, _lon array<double>, _lat array<double>, "
        f"n_points_in long, n_points_out long"
    )

    def kernel(batches):
        for pdf in batches:
            lons, lats, n_in, n_out = [], [], [], []
            for lon_l, lat_l in zip(pdf["_lon"], pdf["_lat"]):
                lon = np.asarray(lon_l, dtype=np.float64)
                lat = np.asarray(lat_l, dtype=np.float64)
                if space == "mercator":
                    xs, ys = _merc_xy_norm(lon, lat)
                else:
                    xs, ys = lon, lat
                mask = rdp_mask(xs, ys, eps)
                lons.append(lon[mask])
                lats.append(lat[mask])
                n_in.append(len(lon))
                n_out.append(int(mask.sum()))
            out = pdf.copy()
            out["_lon"] = lons
            out["_lat"] = lats
            out["n_points_in"] = n_in
            out["n_points_out"] = n_out
            yield out

    done = prepared.mapInPandas(kernel, schema=kern_schema)
    geom_t = ways.schema[geom_col].dataType.simpleString()
    return done.select(
        *other,
        F.expr(
            "transform(arrays_zip(_lon, _lat), "
            "z -> struct(z._lon AS lon, z._lat AS lat))"
        ).cast(geom_t).alias(geom_col),
        "n_points_in",
        "n_points_out",
    )

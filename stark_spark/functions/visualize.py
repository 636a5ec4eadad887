"""Point-frame visualization → PNG.

Reference: `spatial/SpatialRDDFunctions.scala:68-93` + `java/dbis/
stark/visualization/Visualization.java:32-585` — per-partition images
rendered on executors, overlaid on the driver, written as PNG/JPG.

Same split here, zero dependencies: the per-partition render IS the
raster subsystem's `rasterize` (distributed pixel counts, two
small-key shuffles); the driver only receives non-empty TILES (≈ KBs),
composes the count matrix, tone-maps, and writes the PNG with
stdlib zlib (no matplotlib/PIL in this container — and none needed).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame


def _png_bytes(gray: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (stdlib only)."""
    h, w = gray.shape
    raw = b"".join(b"\x00" + gray[j].astype(np.uint8).tobytes()
                   for j in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body +
                struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def render_points(df: DataFrame, width: int, height: int, *,
                  x: str = "x", y: str = "y",
                  bounds: tuple[float, float, float, float] | None = None,
                  path: str | None = None) -> bytes:
    """Render point density to a PNG (white = dense). ``bounds`` =
    (xmin, ymin, xmax, ymax) world window; default = data bounds.
    Returns the PNG bytes; also writes ``path`` when given."""
    from pyspark.sql import functions as F

    from stark_spark.raster import rasterize

    if bounds is None:
        r = df.agg(F.min(x), F.min(y), F.max(x), F.max(y)).first()
        bounds = (float(r[0]), float(r[1]), float(r[2]) + 1e-9, float(r[3]) + 1e-9)
    x0, y0, x1, y1 = bounds
    pw = max((x1 - x0) / width, (y1 - y0) / height)
    # one tile per row of TILE_PX² pixels; driver only sees non-empty tiles
    tiles = rasterize(df.where((F.col(x) >= x0) & (F.col(x) < x1) &
                               (F.col(y) >= y0) & (F.col(y) < y1)),
                      tile_px=64, pixel_width=pw, x=x, y=y,
                      origin=(x0, y0)).collect()

    img = np.zeros((height, width), dtype=np.int64)
    for t in tiles:
        arr = np.asarray(t.data, dtype=np.int64).reshape(t.height, t.width)
        # tile ul in pixel space (y down)
        pi = int(round((t.ulx - x0) / pw))
        pj = int(round((y1 - t.uly) / pw))
        j0, i0 = max(0, pj), max(0, pi)
        j1 = min(height, pj + t.height)
        i1 = min(width, pi + t.width)
        if j1 <= j0 or i1 <= i0:
            continue
        img[j0:j1, i0:i1] += arr[j0 - pj:j1 - pj, i0 - pi:i1 - pi]

    mx = img.max()
    gray = (img * (255.0 / mx)).astype(np.uint8) if mx > 0 else \
        img.astype(np.uint8)
    png = _png_bytes(gray)
    if path:
        with open(path, "wb") as f:
            f.write(png)
    return png

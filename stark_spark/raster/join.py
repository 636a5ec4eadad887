"""Raster ⋈ vector and raster ⋈ raster joins.

Reference: `raster/RasterFilterVectorRDD.scala:44-52` (tile-vs-query
filter with pixel clip), `RasterRDD.scala:66-81` + `raster/
RasterJoinVectorRDD.scala:13-107` (tiles joined to geometries by
predicate, result clipped to matching pixels via `RasterUtils.
getPixels` `RasterUtils.scala:128-216`), `raster/RasterJoinRDD.scala:
10-66` (per overlapping tile pair: intersection MBR, pixel combine).

Physical shape = the engine's standard join recipe: tiles get bbox
columns (`tile_bbox_cols`) → grid cell equi-join → native bbox
prefilter → Arrow-vectorized clip/combine over the pixel arrays. The
pixel work is numpy over Arrow batches — per-tile vectorized, never
per-pixel Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StructField, StructType)

from stark_spark.core import geometry as G
from stark_spark.functions.constructors import st_box
from stark_spark.functions.predicates import _as_geom, bbox_intersects
from stark_spark.partitioner.grid import GridSpec
from stark_spark.raster.tiles import tile_bbox_cols


def _with_tile_geom(t: DataFrame) -> DataFrame:
    """Tile bbox → rectangle WKB geom (the refine side of the joins)."""
    return t.withColumn("geom", st_box(F.col("xmin"), F.col("ymin"),
                                       F.col("xmax"), F.col("ymax")))

_TILE_OUT = StructType([
    StructField("ulx", DoubleType()), StructField("uly", DoubleType()),
    StructField("width", IntegerType()), StructField("height", IntegerType()),
    StructField("pixel_width", DoubleType()),
    StructField("data", ArrayType(LongType())),
])


def _pixel_centers(ulx, uly, w, h, pw):
    xs = ulx + (np.arange(w) + 0.5) * pw
    ys = uly - (np.arange(h) + 0.5) * pw
    gx, gy = np.meshgrid(xs, ys)          # row-major: j rows, i cols
    return gx.ravel(), gy.ravel()


def _clip_tile(row, q: G.Geometry):
    """Crop to the intersection MBR (pixel-aligned) and null out pixels
    whose centers fall outside the geometry — `RasterUtils.getPixels`."""
    ulx, uly, w, h, pw = (row.ulx, row.uly, int(row.width), int(row.height),
                          row.pixel_width)
    qx0, qy0, qx1, qy1 = q.bbox
    i0 = max(0, int(np.floor((qx0 - ulx) / pw)))
    i1 = min(w, int(np.ceil((qx1 - ulx) / pw)))
    j0 = max(0, int(np.floor((uly - qy1) / pw)))
    j1 = min(h, int(np.ceil((uly - qy0) / pw)))
    if i0 >= i1 or j0 >= j1:
        return None
    sub = np.asarray(row.data, dtype=object).reshape(h, w)[j0:j1, i0:i1]
    nw, nh = i1 - i0, j1 - j0
    nulx, nuly = ulx + i0 * pw, uly - j0 * pw
    if q.kind in ("POLYGON", "MULTIPOLYGON") and not q.is_rectangle():
        cx, cy = _pixel_centers(nulx, nuly, nw, nh, pw)
        mask = np.asarray(
            G.points_in_polygon(cx, cy, q, boundary=True)).reshape(nh, nw)
        sub = np.where(mask, sub, None)
    return (nulx, nuly, nw, nh, pw, list(sub.ravel()))


def raster_filter_vector(tiles: DataFrame, query, *, clip: bool = True,
                         time_cols=None) -> DataFrame:
    """Tiles intersecting a constant geometry; optionally clipped
    (`RasterFilterVectorRDD`). Prefilter = native bbox columns →
    partition/row-group prunable; clip = one mapInPandas pass."""
    q = _as_geom(query)
    t = tile_bbox_cols(tiles)
    t = t.filter(bbox_intersects(q))
    if not clip:
        return t.drop("xmin", "ymin", "xmax", "ymax")

    qwkb = G.to_wkb(q)

    def run(batches):
        qg = G.from_wkb(qwkb)
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                r = _clip_tile(row, qg)
                if r is not None:
                    out.append(r)
            yield pd.DataFrame(out, columns=[f.name for f in _TILE_OUT])

    return t.mapInPandas(run, _TILE_OUT)


def raster_join_vector(tiles: DataFrame, vec: DataFrame, *,
                       grid: GridSpec | None = None,
                       clip: bool = True, suffix: str = "_r",
                       vec_rect: bool = False,
                       broadcast: bool = False) -> DataFrame:
    """Tiles ⋈ geometries (intersects): grid cell equi-join + bbox
    prefilter; each matched pair yields the tile clipped to the
    geometry (`RasterJoinVectorRDD`). Output: vec payload + clipped
    tile columns.

    Tiles ARE their envelopes; with ``vec_rect=True`` (axis-aligned
    vector side) the join is declared rect × rect and the whole plan is
    native — no refine UDF and no tile geometry column at all. With
    arbitrary vector geometries the tile side carries a box WKB for
    the pair refine.

    ``broadcast=True``: dim-sized vector side (boundary tables are
    typically O(10²) rows) → BNLJ, skipping the cell explode AND both
    shuffles — the right default whenever vec fits a broadcast."""
    from stark_spark.operators.join import st_join

    t = tile_bbox_cols(tiles)
    if not vec_rect:
        t = _with_tile_geom(t)
    joined = st_join(t, vec, "intersects", grid=grid, suffix=suffix,
                     left_rect=vec_rect, right_rect=vec_rect,
                     broadcast=broadcast)
    if not vec_rect:
        joined = joined.drop("geom")

    keep = [c for c in joined.columns
            if c not in ("xmin", "ymin", "xmax", "ymax")]
    joined = joined.select(*keep)
    if not clip:
        return joined

    rbox = tuple(c + suffix for c in ("xmin", "ymin", "xmax", "ymax"))
    has_geom = ("geom" + suffix) in joined.columns
    pay_fields = [joined.schema[c] for c in joined.columns
                  if c not in ("ulx", "uly", "width", "height", "pixel_width",
                               "data", "geom" + suffix) + rbox]
    out_schema = StructType(list(_TILE_OUT.fields) + pay_fields)
    pay_cols = [f.name for f in pay_fields]

    def run(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples():
                if has_geom:
                    g = G.from_wkb(bytes(getattr(row, "geom" + suffix)))
                else:       # rect vector side: its bbox IS the geometry
                    g = G.box(*(float(getattr(row, c)) for c in rbox))
                r = _clip_tile(row, g)
                if r is not None:
                    rows.append(r + tuple(getattr(row, c) for c in pay_cols))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields])

    return joined.mapInPandas(run, out_schema)


def raster_join_raster(left: DataFrame, right: DataFrame, *, grid: GridSpec,
                       combine: str = "sum", suffix: str = "_r") -> DataFrame:
    """Overlapping tile pairs combined on their intersection MBR
    (`RasterJoinRDD.scala:10-66`): cell equi-join on tile bboxes, then
    one vectorized pass computing ``combine(l_pixel, r_pixel)`` over
    the overlap window. combine ∈ sum|min|max|left.

    Both sides ARE their envelopes → declared rect × rect join: the
    equi-join + bbox algebra is the exact predicate, no geometry
    columns, no refine UDF — fully native up to the pixel-combine
    pass."""
    from stark_spark.operators.join import st_join

    l = tile_bbox_cols(left).select(
        "ulx", "uly", "width", "height", "pixel_width", "data",
        "xmin", "ymin", "xmax", "ymax")
    r = tile_bbox_cols(right).select(
        "ulx", "uly", "width", "height", "pixel_width", "data",
        "xmin", "ymin", "xmax", "ymax")
    joined = st_join(l, r, "intersects", grid=grid, suffix=suffix,
                     left_rect=True, right_rect=True)

    ops = {"sum": lambda a, b: a + b, "min": np.minimum,
           "max": np.maximum, "left": lambda a, b: a}
    op = ops[combine]

    def run(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples():
                pw = row.pixel_width
                x0 = max(row.ulx, getattr(row, "ulx" + suffix))
                y1 = min(row.uly, getattr(row, "uly" + suffix))
                x1 = min(row.ulx + row.width * pw,
                         getattr(row, "ulx" + suffix)
                         + getattr(row, "width" + suffix) * pw)
                y0 = max(row.uly - row.height * pw,
                         getattr(row, "uly" + suffix)
                         - getattr(row, "height" + suffix) * pw)
                nw = int(round((x1 - x0) / pw))
                nh = int(round((y1 - y0) / pw))
                if nw <= 0 or nh <= 0:
                    continue

                def window(ulx, uly, w, h, data):
                    i0 = int(round((x0 - ulx) / pw))
                    j0 = int(round((uly - y1) / pw))
                    arr = np.asarray(data, dtype=np.int64).reshape(h, w)
                    return arr[j0:j0 + nh, i0:i0 + nw]

                a = window(row.ulx, row.uly, int(row.width),
                           int(row.height), row.data)
                b = window(getattr(row, "ulx" + suffix),
                           getattr(row, "uly" + suffix),
                           int(getattr(row, "width" + suffix)),
                           int(getattr(row, "height" + suffix)),
                           getattr(row, "data" + suffix))
                rows.append((x0, y1, nw, nh, pw, list(op(a, b).ravel())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _TILE_OUT.fields])

    return joined.mapInPandas(run, _TILE_OUT)

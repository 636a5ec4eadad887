"""Raster tiles as DataFrame rows — the reference's raster subsystem
re-expressed columnar.

Reference model (`raster/Tile.scala:5-9`): ``Tile[U](ulx, uly, width,
height, data, pixelWidth, sma)`` — upper-left world anchor, row-major
flat pixel array, optional small-materialized-aggregates. Our tile is a
ROW with flat native columns (SURVEY.md §1.8):

    ulx double, uly double, width int, height int, pixel_width double,
    data array<...>  [+ sma_min, sma_max, sma_median]

Pixel (i, j) lives at index ``j*width + i``; its world center is
``(ulx + (i+.5)*pw, uly - (j+.5)*pw)`` (y downward from the top
anchor, matching `Tile.scala:80-143` get/set by world coords).

Everything here is native column expressions (higher-order array
functions) — no UDF, codegen end-to-end; Parquet stats on the sma_*
columns give the reference's SMA skip (`Tile.scala:162-179`) for free.

Cited parity: histogram `Tile.scala:216-253`; countValue/hasValue
`RasterRDD.scala:136-146`; CalcRasterHistogram UDAF
`sql/raster/RasterFunction.scala:37-78`; rasterize `PSF:639-669`;
sources/sinks `STSparkContext.scala:460-553` → parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TILE_COLS = ("ulx", "uly", "width", "height", "pixel_width", "data")


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------

def rasterize(df: DataFrame, *, tile_px: int, pixel_width: float,
              x: str = "x", y: str = "y", value: Column | None = None,
              origin: tuple[float, float] = (0.0, 0.0)) -> DataFrame:
    """Vector→raster (reference `PSF:639-669`): points binned into
    ``tile_px × tile_px`` tiles; each pixel = SUM of ``value`` (count
    when None, as long — integer sums are order-independent, which
    keeps the operator oracle-checkable; double pixel sums would
    depend on reduction order).

    Fully native: tile/pixel ids by floor arithmetic, one groupBy to
    pixel sums, one groupBy assembling the flat array via
    map_from_entries + sequence lookup. Two shuffles total, both on
    small keys — the reference's grid partitioner pass + per-partition
    tile build, minus the custom partitioner.
    """
    span = tile_px * pixel_width
    ox, oy = origin
    v = value if value is not None else F.lit(1).cast("long")
    tx = F.floor((F.col(x) - F.lit(ox)) / F.lit(span)).cast("int")
    ty = F.floor((F.col(y) - F.lit(oy)) / F.lit(span)).cast("int")
    # pixel col within tile; j measured DOWN from the tile's top edge
    i = F.floor((F.col(x) - F.lit(ox)) / F.lit(pixel_width)).cast("int") \
        - tx * tile_px
    j = F.lit(tile_px - 1) - (
        F.floor((F.col(y) - F.lit(oy)) / F.lit(pixel_width)).cast("int")
        - ty * tile_px)
    idx = (j * tile_px + i).cast("int")

    px = (df.select(tx.alias("_tx"), ty.alias("_ty"), idx.alias("_idx"),
                    v.alias("_v"))
            .groupBy("_tx", "_ty", "_idx")
            .agg(F.sum("_v").alias("_pv")))
    m = F.map_from_entries(F.collect_list(F.struct("_idx", "_pv")))
    assembled = (px.groupBy("_tx", "_ty")
                   .agg(m.alias("_m"))
                   .select(
        (F.col("_tx") * F.lit(span) + F.lit(ox)).alias("ulx"),
        ((F.col("_ty") + 1) * F.lit(span) + F.lit(oy)).alias("uly"),
        F.lit(tile_px).alias("width"), F.lit(tile_px).alias("height"),
        F.lit(pixel_width).alias("pixel_width"),
        F.transform(F.sequence(F.lit(0), F.lit(tile_px * tile_px - 1)),
                    lambda k: F.coalesce(F.element_at(F.col("_m"), k),
                                         F.lit(0).cast("long"))).alias("data")))
    return assembled


def tile_bbox_cols(df: DataFrame) -> DataFrame:
    """Attach the ST-frame bbox columns for a tile frame (tile bbox →
    geometry, reference `STConstructor.scala:48-64`): lets every
    spatial operator (filters, grid join, pruning) run on tiles."""
    h = F.col("height") * F.col("pixel_width")
    w = F.col("width") * F.col("pixel_width")
    return (df.withColumn("xmin", F.col("ulx"))
              .withColumn("ymin", F.col("uly") - h)
              .withColumn("xmax", F.col("ulx") + w)
              .withColumn("ymax", F.col("uly")))


# ---------------------------------------------------------------------------
# SMA + accessors (`sql/spatial/STFunction.scala:40-86`)
# ---------------------------------------------------------------------------

def r_min(data: Column = None) -> Column:
    return F.array_min(data if data is not None else F.col("data"))


def r_max(data: Column = None) -> Column:
    return F.array_max(data if data is not None else F.col("data"))


def r_median(data: Column = None) -> Column:
    """Lower median of the sorted pixel array (deterministic; the
    reference sorts and indexes the midpoint, `STFunction.scala:58-86`)."""
    d = data if data is not None else F.col("data")
    s = F.array_sort(d)
    return F.element_at(s, ((F.size(d) + 1) / 2).cast("int"))


def with_sma(df: DataFrame) -> DataFrame:
    """Materialize SMA columns; written to Parquet they become row-group
    stats → scan-level SMA skip (`Tile.scala:162-179`) for free."""
    return (df.withColumn("sma_min", r_min())
              .withColumn("sma_max", r_max())
              .withColumn("sma_median", r_median()))


def count_value(df: DataFrame, v) -> DataFrame:
    """Total occurrences of pixel value v across the raster
    (`RasterRDD.scala:136-146`); SMA skip = native short-circuit on the
    sma_min/sma_max columns when present."""
    per = F.size(F.filter(F.col("data"), lambda p: p == F.lit(v)))
    if "sma_min" in df.columns:
        per = F.when((F.col("sma_min") <= v) & (F.col("sma_max") >= v), per) \
               .otherwise(F.lit(0))
    return df.agg(F.sum(per).alias("n"))


def has_value(df: DataFrame, v) -> bool:
    return count_value(df, v).first().n > 0


# ---------------------------------------------------------------------------
# histograms
# ---------------------------------------------------------------------------

def tile_histogram(df: DataFrame, lo: float, hi: float, buckets: int,
                   key_cols: tuple[str, ...] = ("ulx", "uly")) -> DataFrame:
    """Per-tile equi-width histogram (`Tile.scala:216-253`): one row per
    (tile, bucket) with count; out-of-range pixels clamp to the edge
    buckets (reference Bucket lower/upper inclusive ends)."""
    w = (hi - lo) / buckets
    b = F.least(F.lit(buckets - 1), F.greatest(F.lit(0), F.floor(
        (F.col("_p") - F.lit(lo)) / F.lit(w)).cast("int")))
    return (df.select(*key_cols, F.explode("data").alias("_p"))
              .groupBy(*key_cols, b.alias("bucket"))
              .agg(F.count("*").alias("n")))


def raster_histogram(df: DataFrame, lo: float, hi: float,
                     buckets: int) -> DataFrame:
    """Histogram across ALL tiles — the reference's only UDAF
    (`RasterFunction.scala:37-78` CalcRasterHistogram): here a plain
    explode + groupBy with map-side combine."""
    w = (hi - lo) / buckets
    b = F.least(F.lit(buckets - 1), F.greatest(F.lit(0), F.floor(
        (F.col("_p") - F.lit(lo)) / F.lit(w)).cast("int")))
    return (df.select(F.explode("data").alias("_p"))
              .groupBy(b.alias("bucket"))
              .agg(F.count("*").alias("n")))


# ---------------------------------------------------------------------------
# sources / sinks (`STSparkContext.scala:460-553`, RasterRDD sinks)
# ---------------------------------------------------------------------------

def save_tiles(df: DataFrame, path: str, *, grid=None,
               mode: str = "overwrite") -> None:
    """Tile sink; with a GridSpec, partition by the tile-center cell
    (reference `RasterGridPartitioner.scala:14-93`)."""
    if grid is not None:
        cx = F.col("ulx") + F.col("width") * F.col("pixel_width") / 2
        cy = F.col("uly") - F.col("height") * F.col("pixel_width") / 2
        df = df.withColumn("cell", grid.cell_expr(cx, cy))
        df.write.partitionBy("cell").mode(mode).parquet(path)
    else:
        df.write.mode(mode).parquet(path)


def load_tiles(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("basePath", path).parquet(path)


def tiles_from_csv(spark: SparkSession, path: str,
                   dtype: str = "double") -> DataFrame:
    """Reference CSV tile format (`STSparkContext.tileFile`,
    STC:469-500): one line per tile —
    ``ulx,uly,width,height,pixel_width,v1,…,vN[,sma_min,sma_max,sma_median]``.
    Parsed with native split/slice/transform — no UDF."""
    a = F.split(F.col("value"), ",")
    w = F.element_at(a, 3).cast("int")
    h = F.element_at(a, 4).cast("int")
    npix = w * h
    df = (spark.read.text(path)
          .select(F.element_at(a, 1).cast("double").alias("ulx"),
                  F.element_at(a, 2).cast("double").alias("uly"),
                  w.alias("width"), h.alias("height"),
                  F.element_at(a, 5).cast("double").alias("pixel_width"),
                  F.transform(F.slice(a, F.lit(6), npix),
                              lambda s: s.cast(dtype)).alias("data"),
                  (F.size(a) - npix).alias("_extra"),
                  # try_: OOB → NULL (plain element_at errors under ANSI)
                  F.try_element_at(a, npix + F.lit(6)).cast(dtype).alias("_m1"),
                  F.try_element_at(a, npix + F.lit(7)).cast(dtype).alias("_m2"),
                  F.try_element_at(a, npix + F.lit(8)).cast(dtype).alias("_m3")))
    has_sma = F.col("_extra") >= 8
    return (df.withColumn("sma_min", F.when(has_sma, F.col("_m1")))
              .withColumn("sma_max", F.when(has_sma, F.col("_m2")))
              .withColumn("sma_median", F.when(has_sma, F.col("_m3")))
              .drop("_extra", "_m1", "_m2", "_m3"))


def save_tiles_csv(df: DataFrame, path: str, *,
                   mode: str = "overwrite") -> None:
    """Symmetric CSV tile sink (reference `RasterRDD.saveAsTextFile`)."""
    cols = [F.col("ulx").cast("string"), F.col("uly").cast("string"),
            F.col("width").cast("string"), F.col("height").cast("string"),
            F.col("pixel_width").cast("string"),
            F.array_join(F.transform(F.col("data"),
                                     lambda v: v.cast("string")), ",")]
    if "sma_min" in df.columns:
        cols += [F.col("sma_min").cast("string"),
                 F.col("sma_max").cast("string"),
                 F.col("sma_median").cast("string")]
    line = F.concat_ws(",", *cols)
    df.select(line.alias("value")).write.mode(mode).text(path)

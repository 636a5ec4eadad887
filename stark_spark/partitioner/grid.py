"""Regular grid partitioning — cell-id expressions.

Reference: `partitioner/SpatialGridPartitioner.scala:12-119` (fixed
regular grid, ppD per dimension) + the grid-cell helpers in
`partitioner/GridPartitioner.scala:18-332` (`getCellId` :229).

In our engine a "partitioner" is not a Partitioner object — it's a
**native cell-id column expression**. Data placement = `repartition`/
`partitionBy`/bucketing on that column; partition pruning = Catalyst
filtering on it; the spatial join keys on it. The expression stays in
whole-stage codegen (floor arithmetic, no UDF).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridSpec:
    """Axis-aligned regular grid over [x0,x1) × [y0,y1), nx × ny cells.

    Cells ids are row-major: ``cell = cy * nx + cx``; out-of-bounds
    coordinates clamp to the border cells so every row gets a cell
    (reference invariant: "every point gets a partition",
    `GridPartitionerTest`).
    """

    x0: float
    y0: float
    x1: float
    y1: float
    nx: int = 32
    ny: int = 32

    @property
    def sx(self) -> float:
        return (self.x1 - self.x0) / self.nx

    @property
    def sy(self) -> float:
        return (self.y1 - self.y0) / self.ny

    # -- native expressions --------------------------------------------------
    def _cx(self, x: Column) -> Column:
        raw = F.floor((x - F.lit(self.x0)) / F.lit(self.sx)).cast("int")
        return F.greatest(F.lit(0), F.least(F.lit(self.nx - 1), raw))

    def _cy(self, y: Column) -> Column:
        raw = F.floor((y - F.lit(self.y0)) / F.lit(self.sy)).cast("int")
        return F.greatest(F.lit(0), F.least(F.lit(self.ny - 1), raw))

    def cell_expr(self, x: Column, y: Column) -> Column:
        """Cell id of a point — `GridPartitioner.getCellId` as codegen."""
        return (self._cy(y) * F.lit(self.nx) + self._cx(x)).cast("int")

    def cells_array_expr(self, xmin: Column, ymin: Column,
                         xmax: Column, ymax: Column,
                         expand: float = 0.0) -> Column:
        """Array of all cell ids covered by an envelope (± expand).

        The explode side of the spatial join; for point rows the array
        has length 1. Equivalent of the reference's
        duplicate-to-all-intersecting-partitions prep
        (`SpatialRDD.scala:138-165`).
        """
        cx0 = self._cx(xmin - F.lit(expand))
        cx1 = self._cx(xmax + F.lit(expand))
        cy0 = self._cy(ymin - F.lit(expand))
        cy1 = self._cy(ymax + F.lit(expand))
        return F.flatten(F.transform(
            F.sequence(cy0, cy1),
            lambda cy: F.transform(F.sequence(cx0, cx1),
                                   lambda cx: (cy * F.lit(self.nx) + cx).cast("int"))))

    # -- driver-side helpers ---------------------------------------------
    def cell_of(self, x: float, y: float) -> int:
        cx = min(self.nx - 1, max(0, int((x - self.x0) / self.sx)))
        cy = min(self.ny - 1, max(0, int((y - self.y0) / self.sy)))
        return cy * self.nx + cx

    def cell_bounds(self, cell: int) -> tuple[float, float, float, float]:
        cy, cx = divmod(cell, self.nx)
        return (self.x0 + cx * self.sx, self.y0 + cy * self.sy,
                self.x0 + (cx + 1) * self.sx, self.y0 + (cy + 1) * self.sy)

    def cells_for_query(self, q_bbox: tuple[float, float, float, float],
                        expand: float = 0.0) -> list[int]:
        """Driver-side pruning: cells intersecting a query envelope
        (reference `SpatialFilterRDD.getPartitions` :52-80)."""
        qxmin, qymin, qxmax, qymax = q_bbox
        cx0 = min(self.nx - 1, max(0, int((qxmin - expand - self.x0) / self.sx)))
        cx1 = min(self.nx - 1, max(0, int((qxmax + expand - self.x0) / self.sx)))
        cy0 = min(self.ny - 1, max(0, int((qymin - expand - self.y0) / self.sy)))
        cy1 = min(self.ny - 1, max(0, int((qymax + expand - self.y0) / self.sy)))
        return [cy * self.nx + cx
                for cy in range(cy0, cy1 + 1) for cx in range(cx0, cx1 + 1)]

    # -- constructors ------------------------------------------------------
    @staticmethod
    def from_df(df: DataFrame, nx: int = 32, ny: int = 32,
                bbox_cols=("xmin", "ymin", "xmax", "ymax")) -> "GridSpec":
        """Fit a grid to a frame's bounds (one cheap agg scan; at scale,
        pass known bounds instead — this is a full-data stats pass)."""
        r = df.agg(F.min(bbox_cols[0]), F.min(bbox_cols[1]),
                   F.max(bbox_cols[2]), F.max(bbox_cols[3])).first()
        eps = 1e-9
        return GridSpec(float(r[0]), float(r[1]),
                        float(r[2]) + eps, float(r[3]) + eps, nx, ny)

    @staticmethod
    def unit_grid(extent: float = 100.0, n: int = 32) -> "GridSpec":
        """The default grid over the synthetic [0,100)² testdata space."""
        return GridSpec(0.0, 0.0, extent, extent, n, n)


def with_cell(df: DataFrame, grid: GridSpec, x: str = "xmin", y: str = "ymin",
              col: str = "cell") -> DataFrame:
    """Attach the home-cell id (center/anchor point) natively."""
    return df.withColumn(col, grid.cell_expr(F.col(x), F.col(y)))


def grid_repartition(df: DataFrame, grid: GridSpec,
                     num_partitions: int | None = None) -> DataFrame:
    """Physically co-locate by cell (the `partitionBy(gridPartitioner)`
    equivalent — reference PSF:270-275)."""
    df = with_cell(df, grid)
    return (df.repartition("cell") if num_partitions is None
            else df.repartition(num_partitions, "cell"))


def morton_expr(x: Column, y: Column, *, x0: float, y0: float,
                x1: float, y1: float, bits: int = 16) -> Column:
    """Native Morton (z-order) key: quantize (x, y) to ``bits`` levels
    over the given bounds and interleave the bits (x in the even
    positions). Pure shift/mask column arithmetic — whole-stage
    codegen, no UDF.

    Use as a SORT key (`save_partitioned(zorder=True)`): rows near in
    2-D stay near in file order, so parquet row-group min/max stats
    stay tight in BOTH dimensions at once — an x-major sort leaves the
    y stats spanning the whole extent, killing row-group pruning for
    y-selective queries. This is the standard lakehouse layout trick
    (Delta/Iceberg `OPTIMIZE ZORDER BY`) expressed as one expression.
    """
    assert 1 <= bits <= 16

    def quant(v: Column, lo: float, hi: float) -> Column:
        q = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(1 << bits))
        return F.greatest(F.lit(0).cast("long"),
                          F.least(F.lit((1 << bits) - 1).cast("long"),
                                  q.cast("long")))

    def spread(v: Column) -> Column:
        # 16 -> 32 bit spread via the classic magic masks
        v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF))
        v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
        v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x33333333))
        v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x55555555))
        return v

    return spread(quant(x, x0, x1)).bitwiseOR(
        F.shiftleft(spread(quant(y, y0, y1)), 1))

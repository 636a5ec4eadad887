"""Declarative partitioner factory — the `PartitionerConfig` /
`PartitionerFactory` equivalent (`partitioner/PartitionerConfig.scala:
8-70`: GRID / BSP / RTREE / ST / NONE strategy objects).

`partition_hint(df, strategy, ...)` attaches a partition-id column and
physically repartitions on it; writers can instead `partitionBy` the
column for storage-level placement (sources/partitioned.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from stark_spark.partitioner.bsp import assign_bsp_cells
from stark_spark.partitioner.grid import GridSpec, grid_repartition
from stark_spark.partitioner.rtree import str_repartition
from stark_spark.partitioner.temporal import (spatio_temporal_key,
                                              temporal_range_partition)

STRATEGIES = ("none", "grid", "bsp", "rtree", "temporal", "st")


def partition_hint(df: DataFrame, strategy: str = "grid", *,
                   grid: GridSpec | None = None,
                   num_partitions: int = 64,
                   max_cost: int | None = None,
                   t0: int | None = None, t_width: int | None = None,
                   t_buckets: int = 10) -> DataFrame:
    """Apply a physical placement strategy.

    grid     → home-cell repartition (`SpatialGridPartitioner`)
    bsp      → cost-balanced cells (`BSPartitioner`), fights skew
    rtree    → STR tiling from a sample (`RTreePartitioner`)
    temporal → range placement on t_start (`TemporalRangePartitioner`)
    st       → composite (cell, t_bucket) (`SpatioTempPartitioner`)
    """
    if strategy == "none":
        return df
    if strategy == "grid":
        return grid_repartition(df, grid or GridSpec.from_df(df))
    if strategy == "bsp":
        out, _ = assign_bsp_cells(df, grid or GridSpec.from_df(df),
                                  max_cost=max_cost)
        return out.repartition("bsp_part")
    if strategy == "rtree":
        return str_repartition(df, num_partitions)
    if strategy == "temporal":
        fixed = (t0, t_width) if t0 is not None and t_width is not None else None
        return temporal_range_partition(df, num_partitions, fixed=fixed)
    if strategy == "st":
        if t0 is None or t_width is None:
            r = df.agg({"t_start": "min", "t_end": "max"}).first()
            t0 = int(r[0])
            t_width = max(1, (int(r[1]) - t0) // t_buckets + 1)
        out = spatio_temporal_key(df, grid or GridSpec.from_df(df),
                                  t0, t_width, t_buckets)
        return out.repartition("cell", "t_bucket")
    raise ValueError(f"unknown strategy {strategy!r}; one of {STRATEGIES}")

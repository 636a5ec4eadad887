"""Temporal partitioning.

Reference: `partitioner/TemporalRangePartitioner.scala:16-193` — ranges
over t_start, fixed-width (`fixedRange` :62) or sample-quantile
(`autoRange` :45). Spark's `repartitionByRange` IS the sample-quantile
strategy (it range-samples internally); fixed-width buckets are a
native floor expression. `SpatioTempPartitioner.scala:11-169` composes
a spatial cell with a temporal bucket — ours is just a composite key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stark_spark.partitioner.grid import GridSpec


def t_bucket_expr(t_start: Column, t0: int, width: int, n: int) -> Column:
    """Fixed-width temporal bucket id (clamped), native."""
    raw = F.floor((t_start - F.lit(t0)) / F.lit(width)).cast("int")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw))


def temporal_range_partition(df: DataFrame, num: int,
                             col: str = "t_start",
                             fixed: tuple[int, int] | None = None) -> DataFrame:
    """Range-place rows by time.

    ``fixed=(t0, width)`` → fixed-width buckets (fixedRange);
    otherwise Spark's sampled `repartitionByRange` (autoRange).
    """
    if fixed is not None:
        t0, width = fixed
        return df.withColumn("t_bucket",
                             t_bucket_expr(F.col(col), t0, width, num)) \
                 .repartition("t_bucket")
    return df.repartitionByRange(num, F.col(col))


def spatio_temporal_key(df: DataFrame, grid: GridSpec,
                        t0: int, width: int, n_buckets: int = 10) -> DataFrame:
    """Composite (cell, t_bucket) key — `SpatioTempPartitioner` (:33-82
    uses 10 temporal buckets per spatial cell when rows are intervals)."""
    df = df.withColumn("cell", grid.cell_expr(F.col("xmin"), F.col("ymin")))
    df = df.withColumn("t_bucket",
                       t_bucket_expr(F.col("t_start"), t0, width, n_buckets))
    return df

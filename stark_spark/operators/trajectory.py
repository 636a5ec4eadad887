"""Trajectory analytics: per-entity movement derived from ST event
streams (user_id, ts, x, y) — the classic spatio-temporal workload the
reference's data model implies (STObject sequences per key) but never
ships operators for.

Scale shape: every operator is one shuffle on the entity key with
per-entity ordered windows — no global sort, no driver state. Path
lengths quantize each hop to integer micro-units BEFORE summation so
per-entity totals are exact under any aggregation order (the same
cross-engine trick as the A-ES keys and BM25 scores).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ord(ts_col: str, tie_col: str):
    return [F.col(ts_col), F.col(tie_col)]


def trajectory_stats(df: DataFrame, key: str = "user_id", *,
                     ts_col: str = "t", x: str = "x", y: str = "y",
                     tie_col: str) -> DataFrame:
    """Per-entity trajectory summary: point count, time span, and
    total path length over the (ts, tie)-ordered hops.

    ``tie_col`` breaks equal timestamps deterministically (required
    for reproducible hops — event streams DO carry ts collisions).
    Each hop is quantized to integer micro-units (round(hypot·1e6))
    before the per-entity sum, so the result is bit-stable across
    engines and shuffle orders. Output: (key, n_points, t_start,
    t_end, path_q)."""
    w = Window.partitionBy(key).orderBy(*_ord(ts_col, tie_col))
    dx = F.col(x) - F.lag(x).over(w)
    dy = F.col(y) - F.lag(y).over(w)
    hop = F.sqrt(dx * dx + dy * dy)
    hop_q = F.coalesce(F.round(hop * F.lit(1e6)).cast("long"),
                       F.lit(0))
    return (df.withColumn("_hq", hop_q)
              .groupBy(key)
              .agg(F.count("*").alias("n_points"),
                   F.min(ts_col).alias("t_start"),
                   F.max(ts_col).alias("t_end"),
                   F.sum("_hq").alias("path_q")))


def od_matrix(df: DataFrame, cell: Column, key: str = "user_id", *,
              ts_col: str = "t", tie_col: str,
              bucket: Column | None = None) -> DataFrame:
    """Origin→destination matrix: for each entity (optionally per time
    ``bucket``, e.g. a day), take the FIRST and LAST position's grid
    cell by (ts, tie) order and count entities per (origin, dest)
    pair — the flow-aggregation every movement study starts with.

    One shuffle on (key, bucket); first/last come from min/max over
    an ordered struct (no second window pass). Output: (origin, dest,
    n [, bucket])."""
    okey = F.struct(F.col(ts_col), F.col(tie_col), cell.alias("c"))
    gb = [F.col(key)] + ([bucket.alias("_b")] if bucket is not None
                         else [])
    per = (df.groupBy(*gb)
             .agg(F.min(okey)["c"].alias("origin"),
                  F.max(okey)["c"].alias("dest")))
    out_gb = (["origin", "dest"] + (["_b"] if bucket is not None
                                    else []))
    out = per.groupBy(*out_gb).agg(F.count("*").alias("n"))
    if bucket is not None:
        out = out.withColumnRenamed("_b", "bucket")
    return out

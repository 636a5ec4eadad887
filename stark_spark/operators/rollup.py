"""Multi-grain temporal rollup — GROUPING SETS in one scan.

Net-new vs the reference (timescale-style "continuous aggregate"
shape): one pass over the fact table produces day/month/year (any
grain list) rollups simultaneously via GROUPING SETS — Spark expands
the sets inside a single shuffle with partial aggregation, instead of
one scan + shuffle per grain. At 100 TB that's G× fewer scans for G
grains.

Money/double measures use the repo's integer-cents rule
(round(x·100)::bigint before summing) so results are independent of
float reduction order — oracle-hashable at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRAIN_ORDER = ("day", "week", "month", "year")


def multi_grain_rollup(df: DataFrame, ts_col: str, value_col: str,
                       grains: tuple[str, ...] = ("day", "month", "year"),
                       ) -> DataFrame:
    """→ (grain, bucket, n, total): one row per (grain, time-bucket).

    ``bucket`` is the truncated bucket start as epoch seconds (long —
    keeps the hash comparable across engines' timestamp renderings).
    Grain of each output row is recovered from which grouping column
    is non-null (un-grouped set members are NULL) — no grouping_id()
    portability concerns.
    """
    t = F.col(ts_col)
    pre = df.select(
        *[F.date_trunc(g.upper(), t).cast("long").alias(f"_g_{g}")
          for g in grains],
        F.col(value_col).alias("_v"))
    cols = [f"_g_{g}" for g in grains]
    grouped = pre.groupingSets([[c] for c in cols], *[F.col(c) for c in cols])
    agg = grouped.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("_v") * 100).cast("long")) / 100.0)
        .alias("total"))
    expr = None
    for g in grains:
        cond = F.col(f"_g_{g}").isNotNull()
        expr = F.when(cond, g) if expr is None else expr.when(cond, g)
    return agg.select(expr.alias("grain"),
                      F.coalesce(*cols).alias("bucket"), "n", "total") \
              .where(F.col("bucket").isNotNull())

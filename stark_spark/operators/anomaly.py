"""Robust outlier detection (median / MAD), exact-integer form.

The production outlier rule for metric streams is the robust z-score:
flag x when |x − median| > k·MAD (median absolute deviation). Unlike
mean/stddev it doesn't let the outliers poison their own detector —
and unlike a float z-score it can be computed EXACTLY here: values
ride the cents grid (round(x·100) BIGINT, the repo-wide money trick),
medians are order statistics (lower median — the element at position
⌈n/2⌉ under a total order), and the flag test |v−med| > k·MAD is
pure integer comparison. No float appears anywhere, so the result is
bit-exact in any engine.

Scale shape: one shuffle on the group key, then two window passes
(value rank, deviation rank) over the same partitioning — Spark
reuses the exchange; the med/MAD frames are group-cardinality-sized
and broadcast back. Skewed groups are single-partition sorts — the
same hazard class as any per-key window (AQE cannot split a window
partition); at extreme per-key volume the two medians would move to
a two-pass quantile-cut, trading exactness for balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lower_median(df: DataFrame, group: str, val: str,
                  tiebreak: str) -> DataFrame:
    """(group, med) — value at row_number ⌈n/2⌉ = (n+1) div 2 under
    ORDER BY (val, tiebreak)."""
    from pyspark.sql import Window
    w = Window.partitionBy(group).orderBy(F.col(val), F.col(tiebreak))
    wc = Window.partitionBy(group)
    return (df.withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", F.count("*").over(wc))
              .where(F.col("_rn") == F.expr("(_n + 1) div 2"))
              .select(F.col(group), F.col(val).alias("med")))


def robust_outliers(df: DataFrame, group: str, value: str, key: str, *,
                    k: int = 3) -> DataFrame:
    """Rows where |value_c − median| > k·MAD within their group
    (value_c = round(value·100) cents). Output: (key, group, value_c,
    med_c, mad_c, dev) — every column an exact BIGINT."""
    base = df.select(
        F.col(key), F.col(group),
        F.round(F.col(value) * 100).cast("long").alias("value_c"))
    med = _lower_median(base, group, "value_c", key) \
        .withColumnRenamed("med", "med_c")
    dev = (base.join(F.broadcast(med), group)
               .withColumn("dev", F.abs(F.col("value_c") - F.col("med_c"))))
    mad = _lower_median(dev, group, "dev", key) \
        .withColumnRenamed("med", "mad_c")
    return (dev.join(F.broadcast(mad), group)
               .where(F.col("dev") > F.lit(k) * F.col("mad_c"))
               .select(key, group, "value_c", "med_c", "mad_c", "dev"))

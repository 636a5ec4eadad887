"""Deterministic distinct-count sketching (KMV / bottom-k).

The k-minimum-values sketch (Bar-Yossef et al. 2002): hash every
value onto a uniform grid, keep the k smallest distinct hashes; the
k-th smallest estimates the distinct count as (k−1)·M/kth where M is
the hash-space size. With a DETERMINISTIC hash (md5, as everywhere in
this repo's sampling/dedup tiers) the sketch — and therefore the
estimate — is bit-reproducible in any engine: there is no randomness
to seed and no merge-order dependence (min-k of a set is order-free).

This is the cardinality sketch a 100 TB pipeline actually runs
(HyperLogLog's job) but in an exactly-testable form: the hash is the
52-bit integer from the first 13 hex digits of md5 (exact in BIGINT
and DOUBLE — same grid as `sampling.weighted_sample`'s uniform), and
the estimator is one BIGINT division.

Scale shape: distinct-hash → global bottom-k plans as a per-partition
top-k (TakeOrderedAndProject) — each task keeps k rows, the driver
merge sees tasks·k rows, nothing corpus-sized moves. Mergeability
(union two sketches = bottom-k of concatenation) is the property that
makes this shard-parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 52
HASH_SPACE = 1 << HASH_BITS


def kmv_hash(value: Column) -> Column:
    """52-bit deterministic uniform hash of a value (md5 hex → int)."""
    h = F.md5(value.cast("string"))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("long")


def distinct_kmv(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """KMV distinct-count estimate for ``df[col]``.

    Output (one row): (k_used, kth_min, estimate) where
    ``estimate = (k_used−1)·2^52 div kth_min`` — exact integer
    division, so the whole result is deterministic cross-engine.
    When the true distinct count is ≤ k the sketch is EXACT:
    k_used = n_distinct and estimate reports n_distinct itself.
    """
    hashes = (df.select(kmv_hash(F.col(col)).alias("h"))
                .distinct()
                .orderBy(F.col("h").asc())
                .limit(k))
    agg = hashes.agg(F.count("*").alias("k_used"),
                     F.max("h").alias("kth_min"))
    # k_used < k → sketch saw every distinct hash: report exactly.
    # kth_min = 0 (probability ~2^-52) would zero-divide: same fallback.
    exact_small = (F.col("k_used") < F.lit(k)) | (F.col("kth_min") <= 0)
    est = F.when(
        exact_small, F.col("k_used")
    ).otherwise(
        F.expr(f"(k_used - 1) * {HASH_SPACE}L div kth_min"))
    return agg.select("k_used", "kth_min",
                      est.cast("long").alias("estimate"))

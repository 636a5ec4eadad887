"""Bitmap-index segment analytics (audience overlap).

The classic OLAP bitmap trick: encode each member of a set as one bit
in an array of packed 64-bit words, so set algebra becomes bitwise
AND/OR over words and cardinality becomes popcount — no distinct
shuffle of the raw membership rows at query time.  This is how
audience-segmentation engines (Druid, Pinot, ClickHouse's
groupBitmap) answer "how many users did both X and Y" at 100 TB:
the bitmap is ~|universe|/8 bytes per segment regardless of event
volume, and intersections touch only words both sides materialized.

Everything is integer/bitwise, so results are bit-exact by
construction; the oracle can verify SEMANTICS (exact distinct
intersection counts) without mirroring the word packing.

Scale shape:
- build: one map-side-combined groupBy on (segment, word_idx) —
  `bit_or` partial-aggregates per task, the shuffle carries at most
  one row per (segment, word) rather than per event.
- overlap: equi-join on word_idx (words are co-partitioned by the
  same key), then `bit_count(a & b)` summed — again map-side
  combinable.  No distinct, no row-level self-join of events.
- The word table is the mergeable sketch: union of shards → bit_or
  per word, exactly what the build's groupBy already does.

Reference: the engine this repo mirrors has no bitmap tier (this is
part of the beyond-reference pipeline toolkit, like dedup/ANN).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 64


def bitmap_build(df: DataFrame, key_cols, element: Column) -> DataFrame:
    """Pack ``element`` (non-negative BIGINT, injective member id) into
    per-key word bitmaps: one row per (key..., word_idx) with a 64-bit
    ``bits`` word.  Duplicate members coalesce for free in bit_or.
    """
    key_cols = list(key_cols)
    base = df.select(*key_cols, element.cast("long").alias("el"))
    return (base
            .withColumn("word_idx", F.expr(f"el div {WORD_BITS}"))
            .withColumn("bit", F.expr(f"shiftleft(1L, CAST(el % {WORD_BITS} AS INT))"))
            .groupBy(*key_cols, "word_idx")
            .agg(F.expr("bit_or(bit)").alias("bits")))


def bitmap_cardinality(bm: DataFrame, key_cols) -> DataFrame:
    """Popcount per key: exact distinct-member count of each segment."""
    return (bm.groupBy(*list(key_cols))
              .agg(F.sum(F.expr("bit_count(bits)")).cast("long")
                    .alias("cardinality")))


def bitmap_overlap(bm: DataFrame, key_col: str) -> DataFrame:
    """Pairwise segment intersection/union sizes from one bitmap table.

    For every unordered pair (a < b) of values of ``key_col``:
    n_common = Σ_words popcount(bits_a AND bits_b), plus each side's
    cardinality and the exact Jaccard in basis points
    (``n_common·10000 div n_union`` — integer division, no float).
    Pairs with empty intersection are kept (n_common = 0) so the
    output enumerates the full overlap matrix.
    """
    card = bitmap_cardinality(bm, [key_col])
    a = bm.select(F.col(key_col).alias("seg_a"), "word_idx",
                  F.col("bits").alias("bits_a"))
    b = bm.select(F.col(key_col).alias("seg_b"), "word_idx",
                  F.col("bits").alias("bits_b"))
    inter = (a.join(b, "word_idx")
              .where(F.col("seg_a") < F.col("seg_b"))
              .groupBy("seg_a", "seg_b")
              .agg(F.sum(F.expr("bit_count(bits_a & bits_b)")).cast("long")
                    .alias("n_common")))
    # all pairs (cross of the tiny per-segment cardinality frame) so
    # empty intersections still appear; broadcast both dim-sized sides.
    ca = card.select(F.col(key_col).alias("seg_a"),
                     F.col("cardinality").alias("n_a"))
    cb = card.select(F.col(key_col).alias("seg_b"),
                     F.col("cardinality").alias("n_b"))
    pairs = (F.broadcast(ca).crossJoin(F.broadcast(cb))
              .where(F.col("seg_a") < F.col("seg_b")))
    return (pairs.join(inter, ["seg_a", "seg_b"], "left")
                 .withColumn("n_common",
                             F.coalesce("n_common", F.lit(0)).cast("long"))
                 .withColumn("n_union",
                             (F.col("n_a") + F.col("n_b")
                              - F.col("n_common")).cast("long"))
                 .withColumn("jaccard_bp", F.expr(
                     "CASE WHEN n_union = 0 THEN 0L"
                     " ELSE n_common * 10000 div n_union END"))
                 .select("seg_a", "seg_b", "n_a", "n_b",
                         "n_common", "n_union", "jaccard_bp"))

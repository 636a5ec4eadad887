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


def stay_points(df: DataFrame, key: str = "user_id", *,
                ts_col: str = "t", x: str = "x", y: str = "y",
                tie_col: str, radius: float = 5.0,
                min_dwell: int = 3600) -> DataFrame:
    """Stay-point (dwell) detection under the CHAIN rule: a dwell is
    a maximal run of consecutive points where every hop to the next
    point stays within ``radius``, kept when the run spans at least
    ``min_dwell`` seconds — "where did this entity linger", the other
    half of movement analysis next to `od_matrix`. (The chain rule is
    the window-friendly variant of anchor-based stay detection; its
    known bias: a SLOW drift whose every hop stays under the radius is
    reported as one long "dwell" with unbounded total displacement,
    and two sites connected by sub-radius transit merge — pick the
    radius against sampling cadence × realistic movement speed, or
    post-filter on the centroid spread.)

    Spark shape: the classic gaps-and-islands rewrite — a per-entity
    ordered window flags hops that exceed the radius, a running sum
    of flags labels the runs, one aggregate per (entity, run) emits
    the dwell windows. One shuffle on the entity key. Output: (key,
    stay_start, stay_end, n_points, cx_q, cy_q) with centroid
    coordinates in micro-units (per-point coords are quantized to
    BIGINT before the mean so the oracle is bit-exact)."""
    w = Window.partitionBy(key).orderBy(*_ord(ts_col, tie_col))
    # distance from previous point (chain hop) — a simple, exactly
    # SQL-mirrorable break rule: break when the hop exceeds radius
    dx = F.col(x) - F.lag(x).over(w)
    dy = F.col(y) - F.lag(y).over(w)
    hop = F.sqrt(dx * dx + dy * dy)
    brk = F.when(hop.isNull() | (hop > F.lit(radius)), 1).otherwise(0)
    lab = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    xq = F.round(F.col(x) * F.lit(1e6)).cast("long")
    yq = F.round(F.col(y) * F.lit(1e6)).cast("long")
    runs = (df.withColumn("_lab", lab)
              .withColumn("_xq", xq).withColumn("_yq", yq)
              .groupBy(key, "_lab")
              .agg(F.min(ts_col).alias("stay_start"),
                   F.max(ts_col).alias("stay_end"),
                   F.count("*").alias("n_points"),
                   F.sum("_xq").alias("_sx"),
                   F.sum("_yq").alias("_sy")))
    return (runs.where((F.col("stay_end") - F.col("stay_start"))
                       >= F.lit(min_dwell))
                .select(key, "stay_start", "stay_end", "n_points",
                        F.floor(F.col("_sx") / F.col("n_points"))
                         .cast("long").alias("cx_q"),
                        F.floor(F.col("_sy") / F.col("n_points"))
                         .cast("long").alias("cy_q")))


def colocation_pairs(df: DataFrame, cell: Column, key: str = "user_id",
                     *, ts_col: str = "t", time_window: int = 3600,
                     min_meetings: int = 1) -> DataFrame:
    """Co-location (rendezvous) detection: pairs of DISTINCT entities
    observed in the SAME grid cell within ``time_window`` seconds —
    the contact/encounter primitive of movement analytics. A
    "meeting" is an event pair (one event from each entity) with
    equal cell and |t_a − t_b| <= time_window; the pair is reported
    with its meeting count and first/last meeting times.

    Scale shape: time is binned at time_window width and the LEFT
    side explodes to its 3 adjacent bins, so the join is a pure
    equi-join on (cell, bin) — every qualifying event pair matches
    EXACTLY ONCE (only one exploded bin equals the right event's
    bin), never an all-pairs theta join; skew is bounded by cell
    population within a 3-window band. Output: (a, b, n_meetings,
    t_first, t_last), a < b."""
    t = F.col(ts_col).cast("long")
    b = F.floor(t / F.lit(time_window)).cast("long")
    base = df.select(F.col(key).alias("_k"), cell.alias("_c"),
                     t.alias("_t"), b.alias("_b"))
    left = base.select(
        F.col("_k").alias("a"), F.col("_c"), F.col("_t").alias("_ta"),
        F.explode(F.array(F.col("_b") - 1, F.col("_b"),
                          F.col("_b") + 1)).alias("_jb"))
    right = base.select(F.col("_k").alias("b"), F.col("_c"),
                        F.col("_t").alias("_tb"),
                        F.col("_b").alias("_jb"))
    pairs = (left.join(right, ["_c", "_jb"])
                 .where((F.col("a") < F.col("b"))
                        & (F.abs(F.col("_ta") - F.col("_tb"))
                           <= F.lit(time_window))))
    return (pairs.groupBy("a", "b")
                 .agg(F.count("*").alias("n_meetings"),
                      F.least(F.min("_ta"), F.min("_tb"))
                       .alias("t_first"),
                      F.greatest(F.max("_ta"), F.max("_tb"))
                       .alias("t_last"))
                 .where(F.col("n_meetings") >= min_meetings))

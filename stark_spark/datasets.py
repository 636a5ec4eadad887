"""Loaders for the driver's testdata with deterministic ST columns.

The testdata (TESTDATA.md) is TPC-H-ish with no geometry, so spatial
columns are DERIVED deterministically from key columns with plain
integer arithmetic — the same formulas are expressible in the DuckDB
oracle SQL, which is what makes every spatial operator hash-checkable.

Conventions (keep in sync with `__spark_entry__.oracle_sql`):

* synthetic point for key k:  x = (k * 7919 % 1000) / 10.0,
                              y = (k * 104729 % 1000) / 10.0
  → uniform over [0, 100)².  7919 / 104729 are primes (1000th / 10000th).
* events: x = value (natural column), y = (user_id * 7919 % 1000)/10,
  time = ts as epoch seconds (Instant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stark_spark.functions.constructors import st_frame

PX = 7919
PY = 104729

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# testdata parquet stores these as TIMESTAMP(NANOS); Spark reads them as
# long nanos (legacy conf in session.py) — convert back to TimestampType
# (micro truncation, matching DuckDB's nanos→micros cast).
_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _ensure_runtime_confs(spark: SparkSession) -> None:
    """The driver may hand us a session built WITHOUT our factory
    (`stark_spark.get_session`); the confs load-bearing for the
    testdata are runtime-settable, so set them defensively —
    a vanilla session otherwise throws PARQUET_TYPE_ILLEGAL on the
    TIMESTAMP(NANOS) columns and mismatches the oracle's UTC epochs."""
    for k, v in (("spark.sql.legacy.parquet.nanosAsLong", "true"),
                 ("spark.sql.session.timeZone", "UTC"),
                 ("spark.sql.execution.arrow.pyspark.enabled", "true")):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    _ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for c in _TS_COLS.get(table, ()):
        if dict(df.dtypes).get(c) == "bigint":
            # integer div, not /1000: double division rounds at ~1.7e18 ns
            # (ulp 0.25 µs) and can come out 1 µs off DuckDB's exact
            # nanos→micros truncation
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def synth_xy(df: DataFrame, key: str) -> DataFrame:
    """Deterministic synthetic point columns from an integer key."""
    k = F.col(key).cast("long")
    return (df.withColumn("x", (k * PX % 1000) / 10.0)
              .withColumn("y", (k * PY % 1000) / 10.0))


def synth_xy_sql(key: str) -> tuple[str, str]:
    """The same formulas as oracle SQL fragments."""
    return (f"(({key} * {PX}) % 1000) / 10.0",
            f"(({key} * {PY}) % 1000) / 10.0")


def st_points(spark: SparkSession, sf_dir: str, table: str, key: str,
              keep_geom: bool = True) -> DataFrame:
    """Table → ST point frame on synthetic coords (untimed)."""
    df = synth_xy(load(spark, sf_dir, table), key)
    return st_frame(df, x="x", y="y", keep_geom=keep_geom)


def st_events(spark: SparkSession, sf_dir: str, keep_geom: bool = True) -> DataFrame:
    """events → ST point frame: x = value, y = hash(user_id), t = ts."""
    df = load(spark, sf_dir, "events")
    df = (df.withColumn("x", F.col("value"))
            .withColumn("y", (F.col("user_id").cast("long") * PX % 1000) / 10.0))
    return st_frame(df, x="x", y="y", t_start="ts", keep_geom=keep_geom)


def events_xy_sql() -> tuple[str, str]:
    return "value", f"((user_id * {PX}) % 1000) / 10.0"

"""Table profiling — the validate-before-ingest pass.

Every production pipeline runs a profile before accepting a new data
drop: row count, per-column null rate, per-column cardinality. The
whole profile here is ONE aggregate over one scan — every metric is a
combined agg expression, so a 100 TB profile costs exactly one pass
plus a |columns|-sized result — then an in-plan unpivot (stack) turns
the single wide row into the (column, metric...) report shape.

All metrics are exact integers (counts), so the report is bit-stable
in any engine. Exact distinct on a high-cardinality column is itself
a shuffle (count(DISTINCT) expands to an internal aggregate); for
estimate-grade profiling at extreme cardinality swap in the KMV
sketch (`operators.sketch.distinct_kmv`) per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n, n_null, n_distinct) per profiled column.

    ``n`` repeats the table row count on every row of the report —
    redundancy that makes each report row self-contained (null RATE
    is n_null/n without a second lookup). NULLs do not count toward
    ``n_distinct`` (SQL count-distinct semantics in both engines)."""
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count("*").alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nl{i}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd{i}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nl{i}, _nd{i}" for i, c in enumerate(cols))
    return (wide.select(
                F.col("_n"),
                F.expr(f"stack({len(cols)}, {stack_args}) "
                       f"AS (column_name, n_null, n_distinct)"))
            .select("column_name", F.col("_n").alias("n"),
                    "n_null", "n_distinct"))

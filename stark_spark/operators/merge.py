"""Upsert / CDC-apply — the mutable-table pattern on immutable files.

Every warehouse feed eventually needs "apply these changed rows to
the base table". Without a table format doing it for you, the engine
form is LATEST-WINS MERGE: union base + updates, keep per key the row
with the highest version (updates beat base on version ties), one
shuffle on the key. This is the compaction step of every
merge-on-read system — expressed as a plain deterministic operator so
the result is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, keys: list[str],
                 *, version_col: str) -> DataFrame:
    """Latest-wins upsert: one row per key — the version_col-max row,
    ties broken toward ``updates`` then by nothing else (base and
    updates must each be key-unique at a given version; the standard
    CDC contract). Columns must match (unionByName). Insert = key
    only in updates; update = key in both with newer version; rows
    only in base survive unchanged. One shuffle on the key."""
    from pyspark.sql import Window
    b = base.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    w = (Window.partitionBy(*keys)
         .orderBy(F.desc(version_col), F.desc("_src")))
    return (b.unionByName(u)
             .withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1)
             .drop("_rn", "_src"))

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


def scd2_build(changes: DataFrame, keys: list[str], *, ts_col: str,
               attrs: list[str],
               collapse_unchanged: bool = True) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from a change feed.

    Input: one row per observed state (key..., ts, attrs...); (key,
    ts) must be unique — the standard CDC feed contract. Output: one
    row per VERSION with half-open validity
    [valid_from, valid_to) — valid_to NULL on the current row — plus
    is_current. With ``collapse_unchanged`` (default), consecutive
    rows whose attrs did not change fold into one interval
    (gaps-and-islands: lag-compare flag → running island sum), so
    re-stated identical snapshots don't fragment history.

    Plan shape: one shuffle on the key; two ordered windows over each
    key's (small) change history; no joins. This is the dimension-
    build step every warehouse runs — expressed deterministically so
    an oracle can replay it.
    """
    from pyspark.sql import Window
    w = Window.partitionBy(*keys).orderBy(ts_col)
    state = F.struct(*[F.col(a) for a in attrs])
    if collapse_unchanged:
        prev = F.lag(state).over(w)
        # null-safe compare: NULL attr values are real states (a pair
        # of equal NULLs is "unchanged", NULL vs value is a change)
        changed = (~prev.eqNullSafe(state)).cast("int")
        island = F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, 0))
        versions = (changes
                    .withColumn("_island", island)
                    .groupBy(*keys, "_island")
                    .agg(F.min(ts_col).alias("valid_from"),
                         *[F.first(a).alias(a) for a in attrs]))
    else:
        versions = (changes
                    .select(*keys, F.col(ts_col).alias("valid_from"),
                            *attrs))
    w2 = Window.partitionBy(*keys).orderBy("valid_from")
    return (versions
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .withColumn("is_current", F.col("valid_to").isNull())
            .drop("_island")
            .select(*keys, *attrs, "valid_from", "valid_to",
                    "is_current"))


def point_in_time_join(facts: DataFrame, dim: DataFrame, *,
                       keys: list[str], fact_ts: str,
                       valid_from: str = "valid_from",
                       attrs: list[str]) -> DataFrame:
    """Point-in-time (leakage-free) dimension enrichment: each fact
    row gets the SCD2 version valid at its timestamp — the
    feature-store join that prevents training-serving skew (using
    today's dimension for yesterday's fact leaks the future).

    Because SCD2 versions are non-overlapping and half-open per key,
    "the version where valid_from ≤ ts < valid_to" is exactly "the
    LAST version starting at or before ts" — so this is the as-of
    union-sweep: one window over (key, time) with version rows
    sorted BEFORE equal-timestamp facts, carrying attrs forward with
    ignore-nulls last().  One shuffle on the key, no interval join,
    no valid_to needed.  Facts before the first version keep NULL
    attrs (explicitly: unknowable at the time is NULL, not the
    earliest version — that too would leak).
    """
    from pyspark.sql import Window
    fcols = facts.columns
    f = facts.select(*fcols, F.col(fact_ts).alias("_t"),
                     F.lit(1).alias("_is_fact"),
                     *[F.lit(None).cast(dim.schema[a].dataType)
                        .alias(f"_a_{a}") for a in attrs])
    d_full = dim.select(
        *[F.col(c) if c in keys
          else F.lit(None).cast(facts.schema[c].dataType).alias(c)
          for c in fcols],
        F.col(valid_from).alias("_t"),
        F.lit(0).alias("_is_fact"),
        *[F.col(a).alias(f"_a_{a}") for a in attrs])
    w = (Window.partitionBy(*keys).orderBy("_t", "_is_fact")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = [F.last(f"_a_{a}", ignorenulls=True).over(w).alias(a)
               for a in attrs]
    return (f.unionByName(d_full)
             .select(*fcols, F.col("_is_fact"), *carried)
             .where(F.col("_is_fact") == 1)
             .drop("_is_fact"))


def table_diff(base: DataFrame, other: DataFrame, keys: list[str],
               compare_cols: list[str]) -> DataFrame:
    """Dataset reconciliation (the Datafold-style diff a migration or
    backfill is signed off on): one FULL OUTER join on the key, then
    exact counts — rows only in ``base`` (removed), only in ``other``
    (added), present in both with every compared column equal
    (unchanged), and per-column change counts for rows present in
    both (null-safe: NULL→value and value→NULL count as changes,
    NULL→NULL does not).

    Output: (item, n) rows — '_added', '_removed', '_unchanged',
    '_changed_rows', then 'col:<name>' per compared column.  One
    shuffle (the key join); every count folds into ONE aggregate over
    the joined frame.
    """
    b = base.select(*keys, *[F.col(c).alias(f"_b_{c}")
                             for c in compare_cols],
                    F.lit(1).alias("_in_b"))
    o = other.select(*keys, *[F.col(c).alias(f"_o_{c}")
                              for c in compare_cols],
                     F.lit(1).alias("_in_o"))
    j = b.join(o, keys, "full_outer")
    both = F.col("_in_b").isNotNull() & F.col("_in_o").isNotNull()
    col_changed = {
        c: (both & ~F.col(f"_b_{c}").eqNullSafe(F.col(f"_o_{c}")))
        for c in compare_cols}
    any_changed = None
    for c in compare_cols:
        any_changed = (col_changed[c] if any_changed is None
                       else (any_changed | col_changed[c]))
    aggs = [
        F.sum((F.col("_in_o").isNull()).cast("long")).alias("_removed"),
        F.sum((F.col("_in_b").isNull()).cast("long")).alias("_added"),
        F.sum((both & ~any_changed).cast("long")).alias("_unchanged"),
        F.sum((both & any_changed).cast("long")).alias("_changed_rows"),
    ]
    for c in compare_cols:
        aggs.append(F.sum(col_changed[c].cast("long")).alias(f"_ch_{c}"))
    one = j.agg(*aggs)
    items = [("_added", "_added"), ("_removed", "_removed"),
             ("_unchanged", "_unchanged"),
             ("_changed_rows", "_changed_rows")]
    items += [(f"col:{c}", f"_ch_{c}") for c in compare_cols]
    stack = ", ".join(f"'{name}', {col}" for name, col in items)
    return one.select(F.expr(
        f"stack({len(items)}, {stack}) AS (item, n)")).select(
        "item", F.col("n").cast("long").alias("n"))


def golden_record(df: DataFrame, keys: list[str], *, ts_col: str,
                  tie_col: str, attrs: list[str]) -> DataFrame:
    """Survivorship merge (the MDM "golden record"): one row per
    entity where EACH attribute independently takes its most recent
    NON-NULL observation — unlike `merge_upsert`, which keeps whole
    rows, this fuses columns across rows (the newest row may have a
    NULL phone while an older row has it; the golden record keeps
    both bests).

    Per attribute: max over (ts, tie, value) structs restricted to
    non-null values — associative/commutative, so ONE map-side-
    combined aggregate per entity computes every column, no window,
    no self-join, deterministic under any parallelism (``tie_col``
    breaks exact-ts ties totally). Output: keys + attrs +
    last_seen_ts (newest observation of any attribute).
    """
    aggs = []
    for a in attrs:
        pick = F.when(
            F.col(a).isNotNull(),
            F.struct(F.col(ts_col).alias("ts"),
                     F.col(tie_col).alias("tie"),
                     F.col(a).alias("v")))
        aggs.append(F.max(pick).getField("v").alias(a))
    aggs.append(F.max(F.struct(F.col(ts_col), F.col(tie_col)))
                 .getField(ts_col).alias("last_seen_ts"))
    return df.groupBy(*keys).agg(*aggs)


def agg_delta_apply(base_aggs: DataFrame, delta: DataFrame,
                    keys: list[str], *, value_col: str,
                    op_col: str | None = None) -> DataFrame:
    """Incremental aggregate maintenance (IVM): fold a CDC delta into
    a persisted (keys, n, sum_v) aggregate WITHOUT re-scanning the
    fact table — the view-maintenance identity for distributive
    aggregates: new_state = base ⊕ aggregate(delta), where deletes
    contribute negatively (``op_col`` = +1 insert / −1 delete).

    Shape: one map-side-combined aggregate over the (small) delta +
    one key-equi outer join against the base state — at 100 TB the
    fact table is never touched, only state ∝ |groups| and work ∝
    |delta|. Groups whose count reaches 0 drop out (fully-deleted).
    Only distributive/algebraic aggregates maintain this way (n, sum,
    and anything derived: avg = sum/n); min/max need a re-scan on
    delete — deliberately not offered here.

    Output: keys + (n, sum_v), the new aggregate state.
    """
    sign = (F.col(op_col).cast("long") if op_col
            else F.lit(1).cast("long"))
    d = (delta.groupBy(*keys)
              .agg(F.sum(sign).alias("_dn"),
                   F.sum(sign * F.col(value_col)).alias("_ds")))
    b = base_aggs.select(*keys, F.col("n").alias("_bn"),
                         F.col("sum_v").alias("_bs"))
    merged = (b.join(d, keys, "full_outer")
               .select(*keys,
                       (F.coalesce("_bn", F.lit(0))
                        + F.coalesce("_dn", F.lit(0))).alias("n"),
                       (F.coalesce("_bs", F.lit(0))
                        + F.coalesce("_ds", F.lit(0))).alias("sum_v")))
    return (merged.where(F.col("n") > 0)
                  .select(*keys, F.col("n").cast("long").alias("n"),
                          F.col("sum_v").cast("long").alias("sum_v")))

"""Per-group linear regression from exact integer moments.

Closed-form OLS (y = a + b·x) needs only five sufficient statistics
per group — n, Σx, Σy, Σx², Σy², Σxy — so the whole fit is ONE
map-side-combined aggregate regardless of data volume: the classic
"reduce a model fit to a moments aggregate" pattern every SQL engine
and MLlib summarizer uses.  At 100 TB the shuffle carries exactly one
6-number row per group; nothing else moves.

Determinism contract (the repo standard): inputs arrive as integer
columns on a caller-chosen grid (dollars, cents, counts), so every
moment is an EXACT BIGINT; the only float work is the final per-group
normal-equation quotient, assembled in DOUBLE with a fixed operand
order (mirrored verbatim by the DuckDB oracle) and quantized to a
q6 integer grid.  Degenerate groups (zero x-variance or y-variance)
yield NULL fit columns instead of NaN/Inf.

No counterpart in the reference (dbis-ilm/stark has no model-fitting
tier); included because a training-data pipeline constantly fits
per-segment trends (price elasticity, drift lines, QPS ramps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ols_by_group"]


def ols_by_group(df: DataFrame, *, group_cols: list[str],
                 x_col: str, y_col: str) -> DataFrame:
    """Per-group OLS fit of ``y_col`` on ``x_col`` (both integer grids).

    Output: group_cols + (n, slope_q6, intercept_q6, r2_q6) where
    slope_q6 = round(1e6·b), intercept_q6 = round(1e6·a),
    r2_q6 = round(1e6·R²); NULLs when the group is degenerate
    (n < 2 or zero variance in x; r2 additionally NULL on zero
    variance in y).

    Shape: one hash aggregate on the group key with map-side partial
    moments — the minimal-shuffle fit.  Slope/intercept/R² are pure
    row-local arithmetic on the 1-row-per-group moment frame.
    """
    x, y = F.col(x_col), F.col(y_col)
    m = (df.groupBy(*group_cols)
           .agg(F.count("*").alias("n"),
                F.sum(x).alias("sx"),
                F.sum(y).alias("sy"),
                F.sum(x * x).alias("sxx"),
                F.sum(y * y).alias("syy"),
                F.sum(x * y).alias("sxy")))
    # fixed operand order, mirrored by the oracle text
    dx = ("(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
    dy = ("(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
          " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))")
    cov = ("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))")
    slope = f"({cov} / {dx})"
    intercept = (f"((CAST(sy AS DOUBLE) - {slope}"
                 f" * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))")
    r2 = f"(({cov} * {cov}) / ({dx} * {dy}))"
    q6 = "CAST(round(1000000.0 * {v}) AS BIGINT)"
    ok_x = f"(n >= 2 AND {dx} > 0.0)"
    ok_xy = f"({ok_x} AND {dy} > 0.0)"
    return m.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.expr(f"CASE WHEN {ok_x} THEN {q6.format(v=slope)} END")
         .alias("slope_q6"),
        F.expr(f"CASE WHEN {ok_x} THEN {q6.format(v=intercept)} END")
         .alias("intercept_q6"),
        F.expr(f"CASE WHEN {ok_xy} THEN {q6.format(v=r2)} END")
         .alias("r2_q6"))

"""Distribution-drift monitoring: PSI and chi-square contingency.

The ops a production data pipeline runs between every ingest batch
and its reference window: Population Stability Index over a binned
numeric feature (the credit-scoring / ML-monitoring standard, PSI >
0.2 ≈ action threshold) and the chi-square statistic over a
categorical contingency table (type × weekday shifts, label drift).

Determinism contract (repo standard): all counts are exact integers
from one map-side-combined groupBy; the float steps (ln for PSI,
expected-ratio terms for chi²) are single mirrored expression chains
quantized to BIGINT per bin BEFORE any further combination, so an
oracle reproduces every row bit-for-bit.

Scale shape: groupBy on (bin) / (row_key, col_key) — bounded key
spaces; the totals join is a broadcast of a bins-sized frame.  No
row-scale shuffle beyond the one counting aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_drift(df: DataFrame, *, split: Column, bin_col: Column,
              smoothing: int = 1) -> DataFrame:
    """PSI terms between the two sides of a boolean ``split``
    (True = reference A, False = comparison B) over integer bins.

    Output per bin: (bin, n_a, n_b, psi_term_q6) where
    psi_term_q6 = round(1e6·(pa−pb)·ln(pa/pb)) with add-``smoothing``
    regularised proportions (empty bins would make ln diverge —
    standard practice, and it keeps every bin a finite integer).
    Σ psi_term_q6 / 1e6 is the PSI.
    """
    counts = (df.select(bin_col.cast("long").alias("bin"),
                        split.cast("int").alias("is_a"))
                .groupBy("bin")
                .agg(F.sum("is_a").cast("long").alias("n_a"),
                     F.sum(F.expr("1 - is_a")).cast("long").alias("n_b")))
    tot = counts.agg(F.sum("n_a").alias("tot_a"),
                     F.sum("n_b").alias("tot_b"),
                     F.count("*").alias("k"))
    s = int(smoothing)
    # pa = (n_a+s)/(tot_a+k·s); mirrored verbatim in the oracle
    term = F.expr(
        f"CAST(round(1000000.0 * ("
        f"(CAST(n_a + {s} AS DOUBLE) / CAST(tot_a + k * {s} AS DOUBLE)"
        f" - CAST(n_b + {s} AS DOUBLE) / CAST(tot_b + k * {s} AS DOUBLE))"
        f" * ln((CAST(n_a + {s} AS DOUBLE) / CAST(tot_a + k * {s} AS DOUBLE))"
        f" / (CAST(n_b + {s} AS DOUBLE) / CAST(tot_b + k * {s} AS DOUBLE)))"
        f")) AS BIGINT)")
    return (counts.crossJoin(F.broadcast(tot))
                  .select("bin", "n_a", "n_b", term.alias("psi_term_q6")))


def chi2_contingency(df: DataFrame, *, row_key: Column, col_key: Column
                     ) -> DataFrame:
    """Chi-square contingency terms for two categorical columns.

    Output per observed cell: (r, c, n, expected_q6, chi2_term_q6)
    with expected = row_total·col_total/n_total and
    chi2_term = (n−expected)²/expected, both quantized to 1e-6.
    Σ chi2_term_q6 / 1e6 is the statistic (cells absent from the
    data contribute their expected mass only through the totals —
    the standard observed-cell presentation).
    """
    cells = (df.select(row_key.alias("r"), col_key.alias("c"))
               .groupBy("r", "c")
               .agg(F.count("*").alias("n")))
    row_tot = cells.groupBy("r").agg(F.sum("n").alias("n_r"))
    col_tot = cells.groupBy("c").agg(F.sum("n").alias("n_c"))
    grand = cells.agg(F.sum("n").alias("n_tot"))
    expected = ("CAST(n_r AS DOUBLE) * CAST(n_c AS DOUBLE)"
                " / CAST(n_tot AS DOUBLE)")
    joined = (cells.join(F.broadcast(row_tot), "r")
                   .join(F.broadcast(col_tot), "c")
                   .crossJoin(F.broadcast(grand)))
    return joined.select(
        "r", "c", F.col("n").cast("long").alias("n"),
        F.expr(f"CAST(round(1000000.0 * ({expected})) AS BIGINT)")
         .alias("expected_q6"),
        F.expr(
            f"CAST(round(1000000.0 * "
            f"((CAST(n AS DOUBLE) - ({expected}))"
            f" * (CAST(n AS DOUBLE) - ({expected})) / ({expected})))"
            f" AS BIGINT)").alias("chi2_term_q6"))


def two_proportion_ztest(df: DataFrame, *, arm: Column,
                         converted: Column) -> DataFrame:
    """Two-proportion z-test — the experimentation-platform readout.

    Input: one row per unit with ``arm`` (0/1) and ``converted``
    (0/1).  Output one row: (n_a, x_a, n_b, x_b, z_q6) with
    z = (pa − pb) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) under the pooled
    estimate — counts exact from one aggregate, the z quotient a
    single mirrored double chain quantized to 1e-6 (sqrt is
    IEEE-exact).  Degenerate pools (p̂ ∈ {0,1}: zero variance) report
    the 0 sentinel rather than a NaN.
    """
    agg = (df.select(arm.cast("int").alias("a"),
                     converted.cast("int").alias("c"))
             .agg(F.sum(F.expr("1 - a")).cast("long").alias("n_a"),
                  F.sum(F.expr("(1 - a) * c")).cast("long").alias("x_a"),
                  F.sum("a").cast("long").alias("n_b"),
                  F.sum(F.expr("a * c")).cast("long").alias("x_b")))
    z = (
        "CAST(CASE WHEN x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN 0"
        " ELSE round(1000000.0 * ("
        "(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " / sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
        " * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
        " * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))"
        ")) END AS BIGINT)")
    return agg.select("n_a", "x_a", "n_b", "x_b",
                      F.expr(z).alias("z_q6"))

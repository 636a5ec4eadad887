"""Skew-resilient join utilities.

Hot keys are the classic large-cluster failure: one reducer gets a
whole key's rows while the rest idle. AQE's skew-join split handles
sort-merge joins after the fact; SALTING handles it by construction
and also works for the build side of hash joins: the fact side gets a
deterministic salt in [0, n_salts), the dim side is exploded into
n_salts replicas, and the join key becomes (key, salt) — a key's rows
now spread over n_salts tasks no matter how hot it is.

The salt must be DETERMINISTIC (this repo's no-randomness rule —
results are oracle-checked), but need not be reproducible across
engines: it cancels out of the join result entirely (every fact row
matches exactly its own salt's dim replica), so the oracle is the
plain unsalted join. `xxhash64` over the fact row's columns gives a
uniform spread with zero extra state.

Cost model: the dim side is replicated n_salts× — use for dim tables
(or pre-aggregated frames) orders of magnitude smaller than the fact
side, which is exactly the regime where skew hurts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(fact: DataFrame, dim: DataFrame, on: list[str], *,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with an n_salts-way salted
    key, result identical to the plain join (row-for-row: each fact
    row matches exactly one replica of its dim row).

    ``how``: "inner" or "left" (dim-side semantics of other join
    types don't survive replication; they raise)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if _SALT in fact.columns or _SALT in dim.columns:
        raise ValueError(f"column {_SALT!r} already present")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                  F.lit(n_salts)).cast("int")
    f = fact.withColumn(_SALT, salt)
    d = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return f.join(d, on + [_SALT], how).drop(_SALT)


def key_skew_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pre-shuffle skew profile — the measurement that decides whether
    a join key needs `salted_join` (or AQE skew splitting) BEFORE the
    job runs: per candidate key column, row count, distinct keys, the
    hottest key's row count and its share (ppm), and a quantized
    Shannon-entropy mass Σ cᵢ·⌊ln(cᵢ)·10⁶⌋ (monotone in concentration;
    each per-key term is quantized to BIGINT before the order-free
    sum, the repo's libm posture — H = ln(N) − mass/(N·10⁶)).

    One groupBy per column (the per-key count IS the thing being
    measured, there is no cheaper exact form; for estimate-grade use
    swap in the KMV sketch). All report numbers are exact integers.
    Output: (column_name, n, n_keys, max_key_n, top_share_ppm,
    c_lnc_q)."""
    out = None
    for c in cols:
        counts = df.groupBy(F.col(c)).agg(F.count("*").alias("cnt"))
        rep = counts.agg(
            F.sum("cnt").alias("n"),
            F.count("*").alias("n_keys"),
            F.max("cnt").alias("max_key_n"),
            F.sum(F.expr("cnt * CAST(floor(ln(CAST(cnt AS DOUBLE)) "
                         "* 1000000) AS BIGINT)")).alias("c_lnc_q"),
        ).select(F.lit(c).alias("column_name"), "n", "n_keys",
                 "max_key_n",
                 F.expr("max_key_n * 1000000 div n")
                  .alias("top_share_ppm"), "c_lnc_q")
        out = rep if out is None else out.unionByName(rep)
    return out

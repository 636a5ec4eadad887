"""100x-cardinality dissolve check (r8 verdict ask #8): the operator
path (groupBy → applyInPandas → `_union_tree`) over EDGE-ADJACENT
tilings two orders of magnitude beyond the driver gate.

Builds G groups × N unit tiles each (k×k row-major fill, k =
ceil(sqrt(N)) — every interior edge shared, the shape the pre-r9
kernel refused), dissolves, and checks the integer closed forms per
group: area = N, parts = 1, perimeter = 2(k+q) / 2N+2 / 2k+2q+2
(q = N div k, rem = N mod k). One shuffle on the group key; each
group is one Arrow task running the KD merge tree.

``--skew`` (r9 verdict ask #7) keeps the same 640k total but gives
group 0 a 200,000-tile straggler and splits the rest evenly — the
realistic 100 TB failure mode is one giant key, and the KD merge
tree must bound it (pass bar: wall within 3× of the balanced run).

Usage: python tests/dissolve_scale_check.py [groups] [tiles] [--skew]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _want(n: int) -> tuple:
    k = math.isqrt(n - 1) + 1
    q, rem = divmod(n, k)
    perim = (2 * (k + q) if rem == 0
             else (2 * n + 2 if q == 0 else 2 * k + 2 * q + 2))
    return (1, n, perim)


def run(groups: int = 16, n: int = 20_000, skew: bool = False,
        hier: bool = False) -> tuple[int, float]:
    """Returns (rc, wall_seconds).

    ``hier`` runs the TWO-LEVEL composition of the same `dissolve`
    operator — stage 1 dissolves per (group, contiguous-row band),
    stage 2 dissolves the ≤16 band partials per group. This is the
    documented recipe for giant keys: dissolve is one task per key by
    design (the union must see the whole group), so a key holding a
    third of all rows IS a single-core straggler; the band pre-pass
    parallelizes exactly like a map-side partial aggregate and the
    final merge unions ~16 region polygons instead of 200k tiles."""
    from pyspark.sql import functions as F

    from stark_spark import get_session
    from stark_spark.functions.constructors import st_box
    from stark_spark.functions.register import register_sql_functions
    from stark_spark.operators.overlay import dissolve

    spark = get_session("dissolve-scale", shuffle_partitions=32)
    register_sql_functions(spark)
    total = groups * n
    if skew:
        big = 200_000
        assert total > big and groups > 1
        rest, extra = divmod(total - big, groups - 1)
        sizes = [big] + [rest + (1 if g <= extra else 0)
                         for g in range(1, groups)]
    else:
        sizes = [n] * groups
    want = {g: _want(s) for g, s in enumerate(sizes)}
    sz = ",".join(str(s) for s in sizes)
    rows = (spark.range(groups)
            .select(F.col("id").alias("g"),
                    F.explode(F.sequence(
                        F.lit(0),
                        F.element_at(F.expr(f"array({sz})"),
                                     (F.col("id") + 1).cast("int"))
                        - 1)).alias("r")))
    # per-group k×k row-major fill
    karr = ",".join(str(math.isqrt(s - 1) + 1) for s in sizes)
    kcol = F.element_at(F.expr(f"array({karr})"),
                        (F.col("g") + 1).cast("int"))
    x = (F.col("r") % kcol).cast("double")
    y = F.floor(F.col("r") / kcol).cast("double")
    boxes = rows.select("g", st_box(x, y, x + 1, y + 1).alias("geom"),
                        F.floor(F.col("r") / kcol).alias("_row"),
                        F.floor(F.floor(F.col("r") / kcol)
                                / F.floor((kcol + 15) / 16))
                         .alias("_band"))
    t0 = time.time()
    if hier == "auto":
        # r11: the operator's own selective banding (the study's
        # "shard a giant key only when it dominates the residual
        # schedule" rule as API) — bands the straggler, leaves the
        # balanced groups on the single-level path
        dis = dissolve(boxes.select("g", "geom"), "g", hier="auto")
    elif hier:
        stage1 = dissolve(
            boxes.select((F.col("g") * 64 + F.col("_band")).alias("g2"),
                         "geom"), "g2")
        partials = stage1.select(
            F.floor(F.col("g2") / 64).alias("g"), "geom")
        dis = dissolve(partials, "g")
    else:
        dis = dissolve(boxes.select("g", "geom"), "g")
    out = (dis
           .select("g", "n_parts",
                   F.expr("CAST(st_area(geom) AS BIGINT)").alias("a"),
                   F.expr("CAST(st_length(geom) AS BIGINT)").alias("p")))
    got = {r.g: (r.n_parts, r.a, r.p) for r in out.collect()}
    dt = time.time() - t0
    bad = {g: (v, want[g]) for g, v in got.items() if v != want[g]}
    tag = ("skewed" if skew else "balanced") + (
        "+auto" if hier == "auto" else "+hier" if hier else "")
    if len(got) != groups or bad:
        print(f"FAIL dissolve_scale ({tag}): {len(bad)} bad groups "
              f"{list(bad.items())[:3]}")
        return 1, dt
    print(f"PASS dissolve_scale ({tag}): {groups} groups, sizes "
          f"{max(sizes)}max/{min(sizes)}min ({total} polygons) "
          f"dissolved row-exact in {dt:.1f}s")
    return 0, dt


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew = "--skew" in sys.argv[1:]
    hier = "auto" if "--auto" in sys.argv[1:] \
        else "--hier" in sys.argv[1:]
    groups = int(args[0]) if args else 16
    n = int(args[1]) if len(args) > 1 else 20_000
    rc, _ = run(groups, n, skew=skew, hier=hier)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

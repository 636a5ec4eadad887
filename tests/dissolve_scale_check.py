"""100x-cardinality dissolve check (r8 verdict ask #8): the operator
path (groupBy → applyInPandas → `_union_tree`) over EDGE-ADJACENT
tilings two orders of magnitude beyond the driver gate.

Builds G groups × N unit tiles each (k×k row-major fill, k =
ceil(sqrt(N)) — every interior edge shared, the shape the pre-r9
kernel refused), dissolves, and checks the integer closed forms per
group: area = N, parts = 1, perimeter = 2(k+q) / 2N+2 / 2k+2q+2
(q = N div k, rem = N mod k). One shuffle on the group key; each
group is one Arrow task running the KD merge tree.

Usage: python tests/dissolve_scale_check.py [groups] [tiles_per_group]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    groups = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    from pyspark.sql import functions as F

    from stark_spark import get_session
    from stark_spark.operators.overlay import dissolve

    spark = get_session("dissolve-scale", shuffle_partitions=32)
    from stark_spark.functions.register import register_sql_functions
    register_sql_functions(spark)
    k = math.isqrt(n - 1) + 1           # k×k holds n row-major
    q, rem = divmod(n, k)
    want_perim = (2 * (k + q) if rem == 0
                  else (2 * n + 2 if q == 0 else 2 * k + 2 * q + 2))
    rows = spark.range(groups * n).select(
        (F.col("id") % groups).alias("g"),
        (F.col("id") / groups).cast("long").alias("r"))
    x = (F.col("r") % k).cast("double")
    y = F.floor(F.col("r") / k).cast("double")
    # WKB unit box per row, built natively via the ST constructor
    from stark_spark.functions.constructors import st_box
    boxes = rows.select("g", st_box(x, y, x + 1, y + 1).alias("geom"))
    t0 = time.time()
    out = (dissolve(boxes, "g")
           .select("g", "n_parts",
                   F.expr("CAST(st_area(geom) AS BIGINT)").alias("a"),
                   F.expr("CAST(st_length(geom) AS BIGINT)").alias("p")))
    got = {r.g: (r.n_parts, r.a, r.p) for r in out.collect()}
    dt = time.time() - t0
    bad = {g: v for g, v in got.items() if v != (1, n, want_perim)}
    if len(got) != groups or bad:
        print(f"FAIL dissolve_scale: {len(bad)} bad groups "
              f"{list(bad.items())[:3]} (want (1, {n}, {want_perim}))")
        return 1
    print(f"PASS dissolve_scale: {groups} groups x {n} adjacent tiles "
          f"({groups * n} polygons) dissolved row-exact in {dt:.1f}s "
          f"(area {n}, perim {want_perim}, 1 part per group)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

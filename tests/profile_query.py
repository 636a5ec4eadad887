"""Per-query optimization harness (round 13): isolate one declared
query, time it cold + N warm reps with the bench's count() action (and
optionally the noop sink), and dump `.explain("formatted")` for the
plan record under plans/r13/.

Usage:
    python tests/profile_query.py <query> [<query> ...] \
        [--reps 3] [--noop] [--plan-out plans/r13/<q>_before.txt] \
        [--sf-dir /root/testdata/sf0.1] [--stages]

Methodology matches bench.py (same session settings, same warmup
tables, count() action) so numbers are comparable to
BENCH_LOCAL_r13.json columns; --noop additionally times the noop sink
(guide §1.4 — computes every column) for plan work not visible to
count().
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plan-dir", default=None,
                    help="dump explain('formatted') to <dir>/<q>_<tag>.txt")
    ap.add_argument("--plan-tag", default="before")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--cpus",
                    default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--stages", action="store_true",
                    help="print per-stage wall summaries from the "
                         "status tracker after each rep")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from stark_spark import get_session

    spark = get_session("profile", master=f"local[{args.cpus}]",
                        shuffle_partitions=int(args.cpus))
    from pyspark.sql import functions as _F
    from stark_spark import datasets as D
    for t in ("events", "lineitem", "customer", "supplier", "part"):
        D.load(spark, args.sf_dir, t).count()
    (spark.range(256).groupBy((_F.col("id") % 8).alias("g"))
     .applyInPandas(lambda pdf: pdf, "id long").count())

    qs = dict(entry.retired_queries())
    qs.update(entry.queries())
    for name in args.queries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        build = time.perf_counter() - t0
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            p = os.path.join(args.plan_dir,
                             f"{name}_{args.plan_tag}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            print(f"# plan -> {p}")
        t0 = time.perf_counter()
        n = df.count()
        cold = time.perf_counter() - t0
        warms = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            warms.append(round(time.perf_counter() - t0, 3))
        line = (f"{name}: build={build:.3f}s cold={cold:.3f}s "
                f"warm={warms} ({n} rows)")
        if args.noop:
            t0 = time.perf_counter()
            (fn(spark, args.sf_dir).write.format("noop")
             .mode("overwrite").save())
            line += f" noop={time.perf_counter() - t0:.3f}s"
        print(line)
        if args.stages:
            st = spark.sparkContext.statusTracker()
            ids = sorted(st.getJobIdsForGroup() or [])[-40:]
            print(f"#   last jobs: {ids}")
    spark.stop()


if __name__ == "__main__":
    main()

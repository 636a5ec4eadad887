"""Canary-GATED isolated A/B for single bench queries — the r12
verdict's measurement discipline made code: every rep is bracketed by
BOTH canaries (GEMM + JVM codegen), measured ONLY inside a quiet
window, and discarded if a burst lands mid-rep. Naive isolated runs
got storm-hit twice in r12 (canary 0.86/0.61 vs the 0.04 quiet bar)
because they gated the RUN, not each REP; the storms here are
minutes-apart bursts, so the harness spins between reps and keeps
only bracketed-quiet samples.

Usage:
    python tests/ab_isolated.py QUERY [--reps 6] [--sf SF_DIR]
        [--gemm-bar 0.08] [--jvm-bar 0.12] [--max-attempts 40]
        [--max-wall 900]

Prints one JSON line: accepted warm walls + every canary sample, so
PARITY.md can record the evidence verbatim.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# quiet-host norms on this host class (PARITY bench-noise records):
# gemm ~0.04 s, jvm codegen ~0.078 s
GEMM_BAR = 0.08
JVM_BAR = 0.12


def make_canaries(spark):
    import numpy as np
    a = np.ones((2000, 2000), dtype=np.float32)
    a @ a  # warm BLAS pool

    def gemm() -> float:
        t0 = time.perf_counter()
        a @ a
        return round(time.perf_counter() - t0, 4)

    def jvm() -> float:
        t0 = time.perf_counter()
        spark.range(16_000_000).selectExpr("sum(id * 3 + 7)").first()
        return round(time.perf_counter() - t0, 4)

    jvm()  # JIT the canary plan
    return gemm, jvm


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--gemm-bar", type=float, default=GEMM_BAR)
    ap.add_argument("--jvm-bar", type=float, default=JVM_BAR)
    ap.add_argument("--max-attempts", type=int, default=40)
    ap.add_argument("--max-wall", type=float, default=900.0)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from stark_spark import get_session
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("ab", master=f"local[{cpus}]",
                        shuffle_partitions=int(cpus))
    qs = dict(entry.retired_queries())
    qs.update(entry.pending_queries())
    qs.update(entry.queries())
    fn = qs[args.query]

    gemm, jvm = make_canaries(spark)
    # steady state for THIS query: one cold + one warm, unmeasured
    fn(spark, args.sf).count()
    fn(spark, args.sf).count()

    t_start = time.monotonic()
    accepted: list[float] = []
    rejected = 0
    samples: list[dict] = []

    def quiet() -> tuple[float, float] | None:
        """Poll until a quiet window or timeout; return the quiet
        (gemm, jvm) sample, or None if the storm outlasts us."""
        while time.monotonic() - t_start < args.max_wall:
            g, j = gemm(), jvm()
            samples.append({"gemm": g, "jvm": j})
            if g < args.gemm_bar and j < args.jvm_bar:
                return g, j
            time.sleep(3.0)
        return None

    attempts = 0
    while (len(accepted) < args.reps and attempts < args.max_attempts
           and time.monotonic() - t_start < args.max_wall):
        attempts += 1
        pre = quiet()
        if pre is None:
            break
        t0 = time.perf_counter()
        n = fn(spark, args.sf).count()
        wall = round(time.perf_counter() - t0, 3)
        g1, j1 = gemm(), jvm()
        samples.append({"gemm": g1, "jvm": j1, "wall": wall})
        if g1 < args.gemm_bar and j1 < args.jvm_bar:
            accepted.append(wall)
        else:
            rejected += 1  # burst landed mid-rep: discard the sample
    out = {
        "query": args.query, "sf_dir": args.sf, "rows": n,
        "accepted_warm_s": accepted, "rejected_reps": rejected,
        "attempts": attempts,
        "gemm_bar": args.gemm_bar, "jvm_bar": args.jvm_bar,
        "min": min(accepted) if accepted else None,
        "max": max(accepted) if accepted else None,
        "median": sorted(accepted)[len(accepted) // 2]
        if accepted else None,
        "canary_samples": samples,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

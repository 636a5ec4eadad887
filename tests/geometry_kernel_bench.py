"""Geometry-kernel timing guardrail (r9 verdict ask #5).

core/geometry.py reached ~3k LoC of from-scratch overlay/offset code
across rounds 8–9; the only regression tripwires were gate
wall-times. This script times the CANONICAAL kernel shapes directly
(no Spark, except the tiling dissolve) so future kernel edits diff
against numbers, not vibes. Run, then update the table in PARITY.md:

    python tests/geometry_kernel_bench.py            # kernel shapes
    python tests/dissolve_scale_check.py 32 20000    # 640k tiling

The companion pytest floor lives in tests/test_extras.py
(`test_dissolve_640k_floor`): the 32x20k adjacent-tiling dissolve
must stay under 90 s on local[32].
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stark_spark.core import geometry as G  # noqa: E402


def _poly(*rings):
    return G.Geometry("POLYGON",
                      [np.asarray(r, dtype=float) for r in rings])


def _timed(label, fn, reps=5):
    # best-of-reps: the guardrail wants kernel cost, not GC noise
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best*1000:9.1f} ms   {out}")
    return best


def dumbbell_erode():
    # two 5x7 lobes + 2-wide 4-long neck, eroded past the waist
    ring = [(0, 0), (5, 0), (5, 2), (9, 2), (9, 0), (14, 0), (14, 7),
            (9, 7), (9, 4), (5, 4), (5, 7), (0, 7), (0, 0)]
    r = G.buffer(_poly(ring), -1.5)
    return f"parts={len(r.parts())} area={G.area(r):.4f}"


def hairpin_dilate():
    # 20-bend zigzag corridor — the dilation fallback workload
    pts = [(i * 2.0, 0.0 if i % 2 == 0 else 6.0) for i in range(20)]
    wkt = ("LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts)
           + ")")
    r = G.buffer(G.from_wkt(wkt), 2.5)
    return f"kind={r.kind} area={G.area(r):.4f}"


def flask_courtyard():
    # neck-sealing dilation that mints a courtyard hole (r10 fix)
    ring = [(0, 0), (10, 0), (10, 10), (5.5, 10), (5.5, 7), (8, 7),
            (8, 3), (2, 3), (2, 7), (4.5, 7), (4.5, 10), (0, 10),
            (0, 0)]
    r = G.buffer(_poly(ring), 1.0)
    return f"rings={len(r.coords)} area={G.area(r):.4f}"


def ring_of_discs_union():
    # 20 overlapping unit discs around a circle — courtyard union
    import math as m
    parts = [G.buffer(G.point(5 * m.cos(2 * m.pi * i / 20),
                              5 * m.sin(2 * m.pi * i / 20)), 1.0)
             for i in range(20)]
    u = G.st_union_agg([p.wkb() for p in parts]) \
        if hasattr(G, "st_union_agg") else None
    if u is None:
        g = G.Geometry("MULTIPOINT", [G.point(
            5 * m.cos(2 * m.pi * i / 20),
            5 * m.sin(2 * m.pi * i / 20)) for i in range(20)])
        u = G.buffer(g, 1.0)
    return f"rings={len(u.coords)} area={G.area(u):.4f}"


def tiling_dissolve_400():
    # 20x20 edge-adjacent tiling through the KD union tree
    polys = []
    for r in range(20):
        for c in range(20):
            polys.append([np.array(
                [(c, r), (c + 1, r), (c + 1, r + 1), (c, r + 1),
                 (c, r)], dtype=float)])
    out = G._union_tree(polys)
    a = sum(abs(G._ring_signed_area2(np.asarray(p[0]))) / 2.0
            for p in out)
    return f"parts={len(out)} area={a:.1f}"


def main() -> int:
    print(f"{'shape':34s} {'best-of-5':>12s}")
    _timed("dumbbell erode -1.5 (waist split)", dumbbell_erode)
    _timed("hairpin dilate 20 bends qs8", hairpin_dilate)
    _timed("flask dilate +1 (courtyard mint)", flask_courtyard)
    _timed("20-disc ring union (courtyard)", ring_of_discs_union)
    _timed("20x20 tiling KD union tree", tiling_dissolve_400)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Membership-sampling soak for the r10 advice-fix buffer paths:
holed-polygon dilation (courtyard holes must survive/fill by the
distance rule), negative buffers that split and mint islands, and
structural validity (no nested MULTIPOLYGON, WKT roundtrip parses).

Oracle: for p not near the boundary, p ∈ buffer(g, d>0) iff
dist(p, g) ≤ d, with dist(p, g) = 0 inside g (outside its holes) and
min segment distance otherwise. Tolerance covers arc sagitta."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
from stark_spark.core import geometry as G


def seg_dist(p, a, b):
    ab = b - a
    t = float(np.dot(p - a, ab)) / max(float(np.dot(ab, ab)), 1e-300)
    t = min(1.0, max(0.0, t))
    return float(np.hypot(*(p - (a + t * ab))))


def rings_of(g):
    out = []
    for part in g.parts():
        if part.kind == "POLYGON":
            out.append([np.asarray(r, float) for r in part.coords])
    return out


def pip(p, ring):
    # even-odd
    x, y = p
    inside = False
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if (y1 > y) != (y2 > y):
            xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if xi > x:
                inside = not inside
    return inside


def member(p, g):
    for rs in rings_of(g):
        if pip(p, rs[0]) and not any(pip(p, h) for h in rs[1:]):
            return True
    return False


def dist_to(p, g):
    if g.kind == "LINESTRING":
        c = np.asarray(g.coords, float)
        return min(seg_dist(np.asarray(p, float), c[i], c[i + 1])
                   for i in range(len(c) - 1))
    if member(p, g):
        return 0.0
    d = float("inf")
    for rs in rings_of(g):
        for r in rs:
            for i in range(len(r) - 1):
                d = min(d, seg_dist(np.asarray(p, float), r[i], r[i + 1]))
    return d


def no_nested_multi(g):
    if not g.kind.startswith("MULTI"):
        return True
    return all(not part.kind.startswith("MULTI") for part in g.parts())


rng = np.random.default_rng(20260816)
fails = 0
draws = 0

def check_buffer(g, d, tag):
    global fails, draws
    b = G.buffer(g, d)
    draws += 1
    if d > 0 and b is None:
        print(f"FAIL {tag}: positive buffer returned None"); fails += 1; return
    if b is None:
        return
    assert no_nested_multi(b), f"{tag}: nested MULTI"
    G.from_wkt(G.to_wkt(b))   # WKT roundtrip parses
    # membership sampling
    xmin, ymin, xmax, ymax = g.bbox
    pad = abs(d) + 1.0
    tol = 0.12 * abs(d) + 0.03
    bad = 0
    for _ in range(40):
        p = (rng.uniform(xmin - pad, xmax + pad),
             rng.uniform(ymin - pad, ymax + pad))
        dist = dist_to(p, g)
        if d > 0:
            want_in, want_out = dist < d - tol, dist > d + tol
        else:
            # erosion: p in result iff p inside g with clearance > |d|
            inside = member(p, g)
            # clearance = distance to boundary when inside
            db = min(seg_dist(np.asarray(p, float), r[i], r[i+1])
                     for rs in rings_of(g) for r in rs
                     for i in range(len(r)-1))
            want_in = inside and db > abs(d) + tol
            want_out = (not inside) or db < abs(d) - tol
        got = member(p, b)
        if (want_in and not got) or (want_out and got):
            bad += 1
    if bad:
        print(f"FAIL {tag}: {bad}/40 membership mismatches (d={d:.3f})")
        fails += 1

# family 1: holed rectangles (courtyard survival / fill)
for t in range(150):
    W, H = rng.uniform(6, 14), rng.uniform(6, 14)
    hx, hy = rng.uniform(1.5, W - 3), rng.uniform(1.5, H - 3)
    hw, hh = rng.uniform(1.0, min(3.0, W - hx - 1.2)), rng.uniform(1.0, min(3.0, H - hy - 1.2))
    wkt = (f"POLYGON ((0 0, {W} 0, {W} {H}, 0 {H}, 0 0), "
           f"({hx} {hy}, {hx} {hy+hh}, {hx+hw} {hy+hh}, {hx+hw} {hy}, {hx} {hy}))")
    g = G.from_wkt(wkt)
    d = rng.uniform(0.1, 2.2) * (1 if rng.random() < 0.7 else -1)
    check_buffer(g, d, f"holed#{t}")

# family 2: dumbbells (waist split under erosion, island-free dilation)
for t in range(100):
    r1, r2 = rng.uniform(2, 4), rng.uniform(2, 4)
    neck = rng.uniform(0.4, 1.6)
    L = rng.uniform(8, 14)
    wkt = (f"POLYGON ((0 0, 0 {r1}, {L/2 - 1} {neck/2 + r1/2}, "
           f"{L/2 - 1} {neck}, {L/2 + 1} {neck}, {L/2 + 1} {neck/2 + r2/2}, "
           f"{L} {r2}, {L} 0, 0 0))")
    g = G.from_wkt(wkt)
    d = rng.uniform(0.1, 1.4) * (1 if rng.random() < 0.5 else -1)
    check_buffer(g, d, f"dumbbell#{t}")

# family 3: MULTIPOLYGON negative buffer (nested-MULTI flatten fix)
for t in range(80):
    shapes = []
    for i in range(2):
        x0, y0 = i * 30.0, 0.0
        W, H, neck = rng.uniform(6, 10), rng.uniform(3, 5), rng.uniform(0.4, 1.2)
        shapes.append(f"(({x0} {y0}, {x0} {y0+H}, {x0+W/2-1} {y0+neck}, "
                      f"{x0+W/2+1} {y0+neck}, {x0+W} {y0+H}, {x0+W} {y0}, {x0} {y0}))")
    g = G.from_wkt("MULTIPOLYGON (" + ", ".join(shapes) + ")")
    d = -rng.uniform(0.2, 1.0)
    check_buffer(g, d, f"multi-erode#{t}")

# family 4: TWO-hole rectangles under erosion (hole-merge class —
# the dilated holes can touch, cover the band, or split the region)
for t in range(80):
    W, H = rng.uniform(10, 16), rng.uniform(5, 9)
    h1x = rng.uniform(1.5, W / 2 - 2.5)
    h2x = rng.uniform(W / 2 + 0.5, W - 3.5)
    hy = rng.uniform(1.5, H - 3.5)
    hw = rng.uniform(1.0, 2.0)
    wkt = (f"POLYGON ((0 0, {W} 0, {W} {H}, 0 {H}, 0 0), "
           f"({h1x} {hy}, {h1x} {hy+hw}, {h1x+hw} {hy+hw}, {h1x+hw} {hy}, {h1x} {hy}), "
           f"({h2x} {hy}, {h2x} {hy+hw}, {h2x+hw} {hy+hw}, {h2x+hw} {hy}, {h2x} {hy}))")
    g = G.from_wkt(wkt)
    d = -rng.uniform(0.2, 2.0)
    check_buffer(g, d, f"twohole#{t}")

# family 5: polyline corridors incl. hairpins (dilation winding path)
for t in range(100):
    n = int(rng.integers(3, 9))
    pts = np.cumsum(rng.uniform(-3, 3, size=(n, 2)), axis=0)
    if rng.random() < 0.4:                  # force a hairpin
        pts = np.vstack([pts, pts[-2] + rng.uniform(-0.3, 0.3, 2)])
    if any(np.hypot(*(pts[i + 1] - pts[i])) < 1e-6
           for i in range(len(pts) - 1)):
        continue
    wkt = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
    g = G.from_wkt(wkt)
    d = rng.uniform(0.15, 1.5)
    check_buffer(g, d, f"corridor#{t}")

# family 6: overlay algebra identities on random holed boxes —
# area(A)+area(B) == area(A∪B)+area(A∩B) and
# area(A\B) == area(A) − area(A∩B). Half the draws use INTEGER
# coordinates to force degenerate shared-edge/vertex contact.
def holed_box(rng, integral):
    x0, y0 = rng.uniform(0, 8, 2)
    W, H = rng.uniform(3, 8), rng.uniform(3, 8)
    if integral:
        x0, y0, W, H = round(x0), round(y0), max(3, round(W)), max(3, round(H))
    hx, hy = x0 + W * 0.3, y0 + H * 0.3
    hw, hh = W * 0.3, H * 0.3
    return G.from_wkt(
        f"POLYGON (({x0} {y0}, {x0+W} {y0}, {x0+W} {y0+H}, {x0} {y0+H}, {x0} {y0}), "
        f"({hx} {hy}, {hx} {hy+hh}, {hx+hw} {hy+hh}, {hx+hw} {hy}, {hx} {hy}))")


for t in range(150):
    integral = t % 2 == 0
    A, B = holed_box(rng, integral), holed_box(rng, integral)
    draws += 1
    aA, aB = G.area(A), G.area(B)
    U = G.union(A, B)
    I = G.intersection(A, B)
    D = G.difference(A, B)
    aU = G.area(U)
    aI = G.area(I) if I is not None else 0.0
    aD = G.area(D) if D is not None else 0.0
    tol = 1e-9 * max(aA + aB, 1.0)
    if abs((aA + aB) - (aU + aI)) > tol or abs(aD - (aA - aI)) > tol:
        print(f"FAIL overlay#{t}: A+B={aA+aB:.9f} U+I={aU+aI:.9f} "
              f"D={aD:.9f} A-I={aA-aI:.9f}")
        fails += 1

print(f"# soak: {draws} draws, {fails} failures")
sys.exit(1 if fails else 0)

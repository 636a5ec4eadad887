"""Registry-rotation helper: print the stalest-first query order.

The driver's CORRECTNESS run checks only the FIRST 50 entries of
`__spark_entry__.queries()`, and `tests/test_extras.py::
test_registry_driver_window_packing` enforces that the window holds
the STALEST entries — so when a new CORRECTNESS_r{N}.json lands, the
registry must be re-ordered. This tool computes the order: for every
query, the latest round with a green driver row (never-checked = 0),
then prints all queries stalest-first, annotated — paste-ready input
for reordering `queries()`.

Usage: python tests/rotate_registry.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

root = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root))


def main() -> None:
    import __spark_entry__ as entry
    names = list(entry.queries())
    latest = {n: 0 for n in names}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", p.name).group(1))
        try:
            rows = json.load(open(p))
        except ValueError:
            continue
        for k, v in rows.items():
            if k in latest and isinstance(v, dict) and v.get("hash_match"):
                latest[k] = max(latest[k], rnd)
    order = sorted(names, key=lambda n: (latest[n], names.index(n)))
    for i, n in enumerate(order, 1):
        tag = "WINDOW " if i <= 50 else "       "
        rl = f"r{latest[n]:02d}" if latest[n] else "NEW"
        print(f"{tag}{i:3d}  {rl}  {n}")
    stale_out = [n for n in order[50:] if latest[n] == 0]
    if stale_out:
        print(f"\nWARNING: never-checked beyond window: {stale_out}")


if __name__ == "__main__":
    main()

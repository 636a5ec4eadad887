"""Registry-rotation helper: print (or apply) the stalest-first order.

The driver's CORRECTNESS run checks only the FIRST 50 entries of
`__spark_entry__.queries()`, and `tests/test_extras.py::
test_registry_driver_window_packing` enforces that the window holds
the STALEST entries (as of the `tests/registry_rotation.json` marker)
and that the marker lags the newest CORRECTNESS artifact by at most
one round. When a new CORRECTNESS_r{N}.json lands, run this with
`--apply` as the next round's first commit: it reorders the dict body
of `queries()` stalest-first (tier comments regenerated) and stamps
the marker.

Usage: python tests/rotate_registry.py          # print order only
       python tests/rotate_registry.py --apply  # rewrite + stamp
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

root = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root))


def latest_green(names: list[str]) -> tuple[dict[str, int], int]:
    latest = {n: 0 for n in names}
    newest = 0
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", p.name).group(1))
        try:
            rows = json.load(open(p))
        except ValueError:  # crashed-round artifact
            continue
        newest = max(newest, rnd)
        for k, v in rows.items():
            if k in latest and isinstance(v, dict) and v.get("hash_match"):
                latest[k] = max(latest[k], rnd)
    return latest, newest


def apply_rotation(order: list[str], newest: int) -> None:
    path = root / "__spark_entry__.py"
    src = path.read_text()
    m = re.search(r"(def queries\(\).*?return \{\n)(.*?)(\n    \}\n)",
                  src, re.S)
    assert m, "queries() return-dict not found"
    pairs = dict(re.findall(r'"(\w+)": (\w+),', m.group(2)))
    assert set(pairs) == set(order), "registry names drifted"
    lines: list[str] = []
    latest, _ = latest_green(order)
    cur: int | None = None
    for n in order:
        if latest[n] != cur:
            cur = latest[n]
            tag = ("never driver-checked (new gates)" if cur == 0
                   else f"latest driver-green row: r{cur:02d}")
            lines.append(f"        # --- {tag} ---")
        lines.append(f'        "{n}": {pairs[n]},')
    path.write_text(src[:m.start(2)] + "\n".join(lines) + src[m.end(2):])
    marker = root / "tests" / "registry_rotation.json"
    json.dump({"rotated_for_round": newest}, open(marker, "w"), indent=0)
    print(f"applied: rotated {len(order)} entries, marker = r{newest:02d}")


def main() -> None:
    import __spark_entry__ as entry
    names = list(entry.queries())
    latest, newest = latest_green(names)
    order = sorted(names, key=lambda n: (latest[n], names.index(n)))
    for i, n in enumerate(order, 1):
        tag = "WINDOW " if i <= 50 else "       "
        rl = f"r{latest[n]:02d}" if latest[n] else "NEW"
        print(f"{tag}{i:3d}  {rl}  {n}")
    stale_out = [n for n in order[50:] if latest[n] == 0]
    if stale_out:
        print(f"\nWARNING: never-checked beyond window: {stale_out}")
    if "--apply" in sys.argv:
        apply_rotation(order, newest)


if __name__ == "__main__":
    main()

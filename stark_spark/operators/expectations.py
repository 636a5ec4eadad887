"""Declarative data-quality expectations (validate-before-ingest).

The Great-Expectations-style contract a pipeline runs on every batch
before publishing: each rule is data + a name, the engine turns the
rule list into a handful of aggregate scans and anti-joins and
returns one row per rule with exact violation counts — a frame a
gate (or a CI) can assert on.

Rule shapes (dicts, ``kind`` +  parameters):
- ``{"kind": "not_null", "col": c}``
- ``{"kind": "range", "col": c, "lo": x, "hi": y}``  (inclusive)
- ``{"kind": "regex", "col": c, "pattern": p}``      (full match)
- ``{"kind": "unique", "cols": [c, ...]}``
- ``{"kind": "fk", "col": c, "ref": dim_df, "ref_col": r}``

Scale shape: all not_null/range/regex rules for one table fold into
ONE conditional-count aggregate pass; ``unique`` is a count vs
count-distinct on the key columns (map-side combinable); ``fk`` is a
left-anti join against the (broadcast when small) reference side.
Nothing collects; the report frame is |rules| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expectations_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; one output row per rule:
    (rule, n_checked, n_violations).  NULL handling is explicit:
    range/regex rules do NOT count NULLs as violations (add a
    not_null rule for that contract) — n_checked counts non-null
    values for those kinds."""
    scan_aggs = []
    extra_frames = []
    for r in rules:
        name = F.lit(r.get("name") or _default_name(r))
        kind = r["kind"]
        if kind == "not_null":
            checked = F.count(F.lit(1))
            viol = F.sum(F.col(r["col"]).isNull().cast("long"))
        elif kind == "range":
            c = F.col(r["col"])
            checked = F.sum(c.isNotNull().cast("long"))
            viol = F.sum(((c < r["lo"]) | (c > r["hi"])).cast("long"))
        elif kind == "regex":
            c = F.col(r["col"])
            checked = F.sum(c.isNotNull().cast("long"))
            viol = F.sum((c.isNotNull()
                          & ~c.rlike(r["pattern"])).cast("long"))
        elif kind == "unique":
            cols = [F.col(c) for c in r["cols"]]
            checked = F.count(F.lit(1))
            viol = (F.count(F.lit(1))
                    - F.countDistinct(*cols)).cast("long")
        elif kind == "fk":
            orphans = (df.select(F.col(r["col"]))
                         .where(F.col(r["col"]).isNotNull())
                         .join(r["ref"].select(
                             F.col(r["ref_col"]).alias(r["col"])),
                             r["col"], "left_anti"))
            extra_frames.append(
                df.agg(F.sum(F.col(r["col"]).isNotNull().cast("long"))
                        .alias("n_checked"))
                  .crossJoin(F.broadcast(
                      orphans.agg(F.count("*").alias("n_violations"))))
                  .select(name.alias("rule"),
                          F.col("n_checked").cast("long"),
                          F.col("n_violations").cast("long")))
            continue
        else:
            raise ValueError(f"unknown expectation kind: {kind}")
        scan_aggs.append((name, checked, viol))
    frames = []
    if scan_aggs:
        # ONE scan: every per-column rule is a conditional aggregate
        agg_cols = []
        for i, (_, checked, viol) in enumerate(scan_aggs):
            agg_cols.append(checked.cast("long").alias(f"c{i}"))
            agg_cols.append(F.coalesce(viol, F.lit(0)).cast("long")
                             .alias(f"v{i}"))
        one = df.agg(*agg_cols)
        for i, (name, _, _) in enumerate(scan_aggs):
            frames.append(one.select(name.alias("rule"),
                                     F.col(f"c{i}").alias("n_checked"),
                                     F.col(f"v{i}").alias("n_violations")))
    frames.extend(extra_frames)
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def _default_name(r: dict) -> str:
    if r["kind"] == "unique":
        return f"unique:{','.join(r['cols'])}"
    if r["kind"] == "fk":
        return f"fk:{r['col']}"
    return f"{r['kind']}:{r['col']}"

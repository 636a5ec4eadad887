"""Constructive-overlay operators over geometry columns.

Net-new vs the reference (STARK exposes predicates/joins but no
constructive geometry — SURVEY §2.7 note); the kernel is
`core.geometry._trace_polys`, the same noded-overlay engine behind
`st_union` / `st_intersection` / `st_difference` and the MULTI*-buffer
dissolve. Since r9 degenerate contact computes — EDGE-ADJACENT
tilings (the canonical dissolve input) merge their seams, vertex
touches resolve — and only invalid (self-intersecting) rings raise.
Holed polygons are supported on both sides since r8: inputs may
carry holes, and a dissolve that encloses a courtyard returns a
holed polygon.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StructField,
                               StructType)


def dissolve(df: DataFrame, group_col: str,
             geom_col: str = "geom") -> DataFrame:
    """GIS dissolve: per group, the union of ALL the group's polygons
    in one boundary-trace pass (k rings at once — not a fold, so
    intermediate-shape degeneracies can't arise between steps).

    Scale shape: one shuffle on the group key (`applyInPandas`);
    per-group work is O((Σ ring points)²) in the crossing scan —
    bounded by the group's geometry count, never corpus-wide. NULL
    geometries are dropped; a group with only NULLs emits nothing.
    Output: (group_col, geom [WKB POLYGON/MULTIPOLYGON, holes
    preserved/produced], n_parts — the number of disjoint regions
    after dissolving).
    """
    from stark_spark.core import geometry as G

    schema = StructType([
        df.schema[group_col],
        StructField("geom", BinaryType()),
        StructField("n_parts", LongType()),
    ])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        polys = []
        for wkb in pdf[geom_col]:
            if wkb is None:
                continue
            g = G.from_wkb(bytes(wkb))
            polys.extend(G._overlay_polys_of(g, "dissolve"))
        if not polys:
            return pdf.iloc[0:0][[group_col]].assign(
                geom=None, n_parts=0)
        # ≤64 polygons: one direct overlay pass (bit-stable with the
        # pre-r9 path); larger groups: KD pairwise-merge tree —
        # O(N log N · local) instead of the one-shot O(N²) crossing
        # scan, the 100 TB straggler guard (r8 verdict ask #4)
        merged = G._union_tree(polys)
        out = G._geom_from_polys(merged)
        return pd.DataFrame({group_col: [pdf[group_col].iloc[0]],
                             "geom": [G.to_wkb(out)],
                             "n_parts": [len(merged)]})

    return df.select(group_col, geom_col).groupBy(group_col) \
             .applyInPandas(run, schema=schema)

"""Constructive-overlay operators over geometry columns.

Net-new vs the reference (STARK exposes predicates/joins but no
constructive geometry — SURVEY §2.7 note); the kernel is
`core.geometry._trace_rings`, the same boundary-trace engine behind
`st_union` / `st_intersection` / `st_difference` and the MULTI*-buffer
dissolve. Honest contract inherited from the kernel: exact for
transversal contact, raises on degenerate contact (shared/collinear
edges, vertex touching, tangency) and on results this kernel cannot
represent (holes/annuli).
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
    Output: (group_col, geom [WKB POLYGON/MULTIPOLYGON], n_parts —
    the number of disjoint regions after dissolving).
    """
    from stark_spark.core import geometry as G

    schema = StructType([
        df.schema[group_col],
        StructField("geom", BinaryType()),
        StructField("n_parts", LongType()),
    ])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rings = []
        for wkb in pdf[geom_col]:
            if wkb is None:
                continue
            g = G.from_wkb(bytes(wkb))
            if g.kind == "POLYGON":
                if len(g.coords) != 1:
                    raise ValueError("dissolve: holed polygons "
                                     "unsupported")
                rings.append(G._norm_ccw_ring(g.coords[0]))
            elif g.kind == "MULTIPOLYGON":
                for p in g.parts():
                    if len(p.coords) != 1:
                        raise ValueError("dissolve: holed polygons "
                                         "unsupported")
                    rings.append(G._norm_ccw_ring(p.coords[0]))
            else:
                raise ValueError(f"dissolve: {g.kind} unsupported")
        if not rings:
            return pdf.iloc[0:0][[group_col]].assign(
                geom=None, n_parts=0)
        merged = G._trace_rings(rings, "union")
        if len(merged) == 1:
            out = G.Geometry("POLYGON", [merged[0]])
        else:
            out = G.Geometry(
                "MULTIPOLYGON",
                [G.Geometry("POLYGON", [r]) for r in merged])
        return pd.DataFrame({group_col: [pdf[group_col].iloc[0]],
                             "geom": [G.to_wkb(out)],
                             "n_parts": [len(merged)]})

    return df.select(group_col, geom_col).groupBy(group_col) \
             .applyInPandas(run, schema=schema)

"""SQL function registration — the `st_*` surface.

Reference registers its functions into the session's function registry
(`/root/reference/sql/Functions.scala:16-48`), making
``SELECT … WHERE st_intersects(l.geo, r.geo)`` work. We register
plain Python/pandas UDFs under the same names; no Catalyst strategy is
needed because our joins are explicit plan rewrites
(`stark_spark.operators.join`) — SURVEY.md §3.2.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (BinaryType, BooleanType, DoubleType, LongType,
                               StructField, StructType)

from stark_spark.core import geometry as G


def _pair_pred(fn):
    def run(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for xa, xb in zip(a, b):
            if xa is None or xb is None:
                out.append(None)
                continue
            out.append(bool(fn(G.from_wkb(bytes(xa)), G.from_wkb(bytes(xb)))))
        return pd.Series(out, dtype=object)
    return pandas_udf(run, BooleanType())


def register_sql_functions(spark: SparkSession) -> None:
    """Idempotent registration of the SQL surface (§2.7 parity table)."""
    from stark_spark.functions.constructors import (
        _st_point_udf, _st_geomfromwkt_udf, _st_wkt_udf, _st_bbox_udf)

    spark.udf.register("st_point", _st_point_udf)
    spark.udf.register("st_geomfromwkt", _st_geomfromwkt_udf)
    spark.udf.register("st_wkt", _st_wkt_udf)
    spark.udf.register("st_bbox", _st_bbox_udf)

    spark.udf.register("st_intersects", _pair_pred(G.intersects))
    spark.udf.register("st_contains", _pair_pred(G.contains))
    spark.udf.register("st_containedby", _pair_pred(lambda a, b: G.contains(b, a)))
    spark.udf.register("st_covers", _pair_pred(G.covers))
    spark.udf.register("st_coveredby", _pair_pred(lambda a, b: G.covers(b, a)))

    def _dist(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for xa, xb in zip(a, b):
            if xa is None or xb is None:
                out.append(None)
                continue
            out.append(G.distance(G.from_wkb(bytes(xa)), G.from_wkb(bytes(xb))))
        return pd.Series(out, dtype="float64")

    spark.udf.register("st_distance", pandas_udf(_dist, DoubleType()))

    # st_sto(wkt, epoch_sec[, epoch_end]) → ST struct (reference
    # `STConstructor.scala:98-148` MakeSTObject: WKT + date → STObject)
    _STO = StructType([StructField("geom", BinaryType()),
                       StructField("t_start", LongType()),
                       StructField("t_end", LongType())])

    def _sto(wkt: pd.Series, ts: pd.Series) -> pd.DataFrame:
        geoms, starts = [], []
        for w, t in zip(wkt, ts):
            geoms.append(None if w is None else G.to_wkb(G.from_wkt(w)))
            starts.append(None if t is None or pd.isna(t) else int(t))
        return pd.DataFrame({"geom": geoms, "t_start": starts,
                             "t_end": starts})

    spark.udf.register("st_sto", pandas_udf(_sto, _STO))

    # raster accessors as pure-SQL scalar functions (stay native —
    # reference `STFunction.scala:40-86`, tile getters
    # `RasterGetter.scala:19-72` are plain column reads on our flat
    # tile columns)
    for name, body in (
        ("r_min", "array_min(a)"),
        ("r_max", "array_max(a)"),
        ("r_median",
         "element_at(array_sort(a), CAST((size(a) + 1) / 2 AS INT))"),
    ):
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}"
                  f"(a ARRAY<BIGINT>) RETURNS BIGINT RETURN {body}")

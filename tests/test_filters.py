"""End-to-end predicate-filter tests (milestone 0 slice).

Parity model: reference `SpatialRDDTestCase.scala` — same logical
assertion, multiple physical plans (native-exact rectangle vs
UDF-refined polygon), verified against a pandas recomputation.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stark_spark import datasets as D
from stark_spark.core import geometry as G
from stark_spark.functions import st_predicate, st_distance_to, register_sql_functions
from stark_spark.functions.distance import st_distance_xy


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return D.st_events(spark, sf_dir).cache()


def _events_pdf(events):
    return events.select("event_id", "x", "y", "t_start").toPandas()


def test_rectangle_filter_is_native_and_exact(spark, sf_dir, events):
    q = G.box(50, 20, 150, 80)
    got = events.filter(
        st_predicate(q, "intersects", points=True, t_query="any"))
    pdf = _events_pdf(events)
    want = ((pdf.x >= 50) & (pdf.x <= 150) & (pdf.y >= 20) & (pdf.y <= 80)).sum()
    assert got.count() == want
    # the pure-native point pipeline (keep_geom=False) must plan zero
    # python UDFs end-to-end — rectangle bbox test is exact for points
    native = D.st_events(spark, sf_dir, keep_geom=False).filter(
        st_predicate(q, "intersects", points=True, t_query="any"))
    assert native.count() == want
    plan = native._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_polygon_filter_refine(events):
    tri = G.from_wkt("POLYGON ((0 0, 200 0, 0 100, 0 0))")
    got = events.filter(st_predicate(tri, "intersects", t_query="any")).count()
    pdf = _events_pdf(events)
    want = int(G.points_in_polygon(pdf.x.to_numpy(), pdf.y.to_numpy(), tri).sum())
    assert got == want
    assert got > 0


def test_temporal_both_or_neither_rule(spark, sf_dir):
    """§1.2: timed query matches only rows with defined, intersecting time;
    untimed query matches only untimed rows."""
    df = D.load(spark, sf_dir, "events")
    df = (df.withColumn("x", F.col("value"))
            .withColumn("y", (F.col("user_id").cast("long") * D.PX % 1000) / 10.0))
    # make half the rows untimed
    df = df.withColumn("ts2", F.when(F.col("event_id") % 2 == 0, F.col("ts")))
    from stark_spark.functions.constructors import st_frame
    stf = st_frame(df, x="x", y="y", t_start="ts2").cache()
    q = G.box(0, 0, 1000, 1000)  # spatially all-inclusive

    total = stf.count()
    untimed = stf.filter(F.col("t_start").isNull()).count()
    timed = total - untimed

    # untimed query → exactly the untimed rows
    assert stf.filter(st_predicate(q, "intersects", points=True)).count() == untimed

    # all-time query → exactly the timed rows
    lo = stf.agg(F.min("t_start")).first()[0]
    hi = stf.agg(F.max("t_start")).first()[0]
    got = stf.filter(st_predicate(q, "intersects", points=True,
                                  t_query=(lo, hi))).count()
    assert got == timed

    # narrow time window → strict subset, matches manual recount
    mid = (lo + hi) // 2
    got_half = stf.filter(st_predicate(q, "intersects", points=True,
                                       t_query=(lo, mid))).count()
    want_half = stf.filter(F.col("t_start").isNotNull() &
                           (F.col("t_start") <= mid)).count()
    assert got_half == want_half


def test_within_distance(events):
    center = G.point(100, 50)
    d = 25.0
    got = events.filter(F.col("t_start").isNotNull())\
        .filter(st_distance_to(center) <= d).count()
    pdf = _events_pdf(events)
    want = int((np.hypot(pdf.x - 100, pdf.y - 50) <= d).sum())
    assert got == want
    # native variant over x/y columns gives the same answer without UDF
    got2 = events.filter(
        st_distance_xy(F.col("x"), F.col("y"), F.lit(100.0), F.lit(50.0)) <= d
    ).count()
    assert got2 == want


def test_containedby_strict_vs_coveredby(spark):
    rows = [(1, 0.0, 0.0), (2, 5.0, 5.0), (3, 10.0, 10.0)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    from stark_spark.functions.constructors import st_frame
    stf = st_frame(df, x="x", y="y")
    q = G.box(0, 0, 10, 10)
    cov = stf.filter(st_predicate(q, "coveredby", points=True, t_query="any"))
    con = stf.filter(st_predicate(q, "containedby", points=True, t_query="any"))
    assert {r.id for r in cov.collect()} == {1, 2, 3}
    assert {r.id for r in con.collect()} == {2}


def test_sql_registration(spark):
    register_sql_functions(spark)
    row = spark.sql(
        "SELECT st_intersects(st_geomfromwkt('POINT (1 1)'), "
        "st_geomfromwkt('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')) AS ok, "
        "st_distance(st_geomfromwkt('POINT (0 0)'), "
        "st_geomfromwkt('POINT (3 4)')) AS d").first()
    assert row.ok is True and row.d == pytest.approx(5.0)
    row2 = spark.sql("SELECT st_wkt(st_point(1.5, 2.5)) AS w").first()
    assert row2.w == "POINT (1.5 2.5)"


def test_convex_native_equals_udf_refine(spark, sf_dir):
    """The convex half-plane fast path (native, points=True) must agree
    with the generic Arrow PIP refine (points=False) — same polygon,
    vertices off the data lattice so no eps-boundary ambiguity."""
    wkt = ("POLYGON ((3.1411 7.777, 88.613 1.234, 97.42 55.55, "
           "60.001 93.3, 11.17 88.88, 3.1411 7.777))")
    fast = D.st_events(spark, sf_dir, keep_geom=False).filter(
        st_predicate(wkt, "intersects", points=True, t_query="any"))
    slow = D.st_events(spark, sf_dir).filter(
        st_predicate(wkt, "intersects", points=False, t_query="any"))
    a = {r.event_id for r in fast.select("event_id").collect()}
    b = {r.event_id for r in slow.select("event_id").collect()}
    assert a == b and len(a) > 0
    # the fast path must plan with zero python UDFs
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_custom_distance_function_knn_and_radius(spark, sf_dir):
    """Reference distFunc parity: kNN and withinDistance accept an
    arbitrary distance Column (here weighted ST) and must agree with
    an explicit recomputation."""
    from stark_spark.functions.distance import (st_distance_xy,
                                                temporal_distance,
                                                weighted_st_distance)
    from stark_spark.operators.knn import knn
    ev = D.st_events(spark, sf_dir, keep_geom=False)
    t0 = 1704844800
    d = weighted_st_distance(
        st_distance_xy(F.col("x"), F.col("y"), F.lit(50.0), F.lit(50.0)),
        temporal_distance(F.col("t_start"), F.lit(t0)), w_time=0.001)
    got = knn(ev, "POINT (50 50)", 10, distance=d, tie_col="event_id")
    rows = got.select("event_id", "dist").collect()
    pdf = ev.select("event_id", "x", "y", "t_start").toPandas()
    import numpy as np
    pdf["d"] = (np.hypot(pdf.x - 50, pdf.y - 50) +
                0.001 * (pdf.t_start - t0).abs())
    want = pdf.sort_values(["d", "event_id"]).head(10)
    assert [r.event_id for r in rows] == list(want.event_id)

    from stark_spark.functions.predicates import within_distance
    rad = ev.filter(within_distance("POINT (50 50)", 20.0, points=True,
                                    distance=d))
    n_want = int((pdf.d <= 20.0).sum())
    assert rad.count() == n_want

"""Streaming tier: file-source micro-batches vs batch recomputation.

Each test streams the sf0.001 events table through
``trigger(availableNow=True)`` into a memory sink and asserts the
result equals the same aggregation computed in batch — arrival order
and micro-batching must not change answers.
"""

import uuid

import pytest
from pyspark.sql import functions as F

from stark_spark import datasets as D
from stark_spark.partitioner.grid import GridSpec
from stark_spark.streaming import (read_event_stream, session_stats,
                                   st_stream_filter, stateful_cell_extremes,
                                   windowed_cell_counts, windowed_stats)

GRID = GridSpec.unit_grid(100.0, 8)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """events split into several files so availableNow gives multiple
    micro-batches."""
    d = tmp_path_factory.mktemp("stream") / "events"
    ev = D.load(spark, "/root/testdata/sf0.001", "events")
    ev = (ev.withColumn("x", F.col("value"))
            .withColumn("y", (F.col("user_id").cast("long") * 7919 % 1000) / 10.0))
    ev.repartition(6).write.parquet(str(d))
    return str(d), ev.schema


def _run(stream_df, name=None):
    name = name or f"t_{uuid.uuid4().hex[:8]}"
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("complete" if stream_df.isStreaming else "append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return name


def _run_append(stream_df, name=None):
    name = name or f"t_{uuid.uuid4().hex[:8]}"
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return name


def test_stream_filter_stateless(spark, stream_dir):
    path, schema = stream_dir
    s = read_event_stream(spark, path, schema, max_files=2)
    out = st_stream_filter(
        s, "POLYGON ((10 10, 60 10, 60 80, 10 80, 10 10))", points=True)
    name = _run_append(out.select("event_id"))
    got = {r.event_id for r in spark.sql(f"SELECT * FROM {name}").collect()}
    ev = D.st_events(spark, "/root/testdata/sf0.001", keep_geom=False)
    want = {r.event_id for r in
            ev.where((F.col("x") >= 10) & (F.col("x") <= 60) &
                     (F.col("y") >= 10) & (F.col("y") <= 80))
              .select("event_id").collect()}
    assert got == want


def test_windowed_stats_match_batch(spark, stream_dir):
    path, schema = stream_dir
    s = read_event_stream(spark, path, schema, max_files=2)
    out = windowed_stats(s, window="1 day", watermark="1 hour",
                         keys=("event_type",))
    name = _run(out)
    got = {(str(r.win_start), r.event_type): (r.n, r.sum_value)
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    ev = D.load(spark, "/root/testdata/sf0.001", "events")
    want = {(str(r.day), r.event_type): (r.n, r.sum_value)
            for r in ev.groupBy(
                F.date_trunc("day", "ts").alias("day"), "event_type")
            .agg(F.count("*").alias("n"),
                 (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)
                 .alias("sum_value")).collect()}
    assert got == want


def test_windowed_cell_counts(spark, stream_dir):
    path, schema = stream_dir
    s = read_event_stream(spark, path, schema, max_files=3)
    out = windowed_cell_counts(s, GRID, window="7 days", watermark="1 hour")
    name = _run(out)
    got = spark.sql(f"SELECT sum(n) AS s FROM {name}").first().s
    assert got == D.load(spark, "/root/testdata/sf0.001", "events").count()


def test_session_stats_matches_batch(spark, stream_dir):
    path, schema = stream_dir
    s = read_event_stream(spark, path, schema, max_files=3)
    out = session_stats(s, gap="2 hours", watermark="1 hour")
    name = _run_append(out)
    got = {(str(r.sess_start), str(r.sess_end), r.user_id, r.n)
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    # batch recomputation: streaming emits exactly the sessions the
    # final watermark (max ts - 1h) has closed; newer state is held
    ev = D.load(spark, "/root/testdata/sf0.001", "events")
    import datetime
    wm = ev.agg(F.max("ts")).first()[0] - datetime.timedelta(hours=1)
    batch = (ev.groupBy(F.session_window("ts", "2 hours").alias("sw"),
                        "user_id")
               .agg(F.count("*").alias("n")))
    want = {(str(r.sw.start), str(r.sw.end), r.user_id, r.n)
            for r in batch.collect() if r.sw.end <= wm}
    assert want <= got
    # nothing emitted that batch doesn't know about
    all_batch = {(str(r.sw.start), str(r.sw.end), r.user_id, r.n)
                 for r in batch.collect()}
    assert got <= all_batch
    assert len(got) > 0


def test_stateful_cell_extremes(spark, stream_dir):
    path, schema = stream_dir
    s = read_event_stream(spark, path, schema, max_files=2)
    out = stateful_cell_extremes(s, GRID)
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # state emits once per batch per cell; the LAST emission per cell
    # must equal the batch-global aggregate
    ev = D.load(spark, "/root/testdata/sf0.001", "events")
    ev = (ev.withColumn("x", F.col("value"))
            .withColumn("y", (F.col("user_id").cast("long") * 7919 % 1000) / 10.0))
    want = {r.cell: (r.n, r.v_min, r.v_max) for r in
            ev.withColumn("cell", GRID.cell_expr(F.col("x"), F.col("y")))
              .groupBy("cell")
              .agg(F.count("*").alias("n"), F.min("value").alias("v_min"),
                   F.max("value").alias("v_max")).collect()}
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    last = pdf.groupby("cell").last()
    got = {int(c): (int(r.n), r.v_min, r.v_max) for c, r in last.iterrows()}
    assert {c: v[0] for c, v in got.items()} == {c: v[0] for c, v in want.items()}
    for c in want:
        assert abs(got[c][1] - want[c][1]) < 1e-9
        assert abs(got[c][2] - want[c][2]) < 1e-9

def test_geofence_counts_match_batch(spark, stream_dir):
    from stark_spark.functions.constructors import st_frame
    from stark_spark.functions.predicates import st_predicate
    from stark_spark.streaming import geofence_counts
    path, schema = stream_dir
    fences = st_frame(spark.createDataFrame(
        [(1, "POLYGON ((0 0, 50 0, 50 100, 0 100, 0 0))"),
         (2, "POLYGON ((50 0, 100 0, 100 100, 50 100, 50 0))")],
        "fence_id int, wkt string"), wkt="wkt")
    s = read_event_stream(spark, path, schema, max_files=3)
    out = geofence_counts(s, fences, window="30 days", watermark="1 hour")
    name = _run(out)
    got = {r.fence_id: r.s for r in spark.sql(
        f"SELECT fence_id, sum(n) AS s FROM {name} GROUP BY fence_id"
    ).collect()}
    ev = D.st_events(spark, "/root/testdata/sf0.001", keep_geom=True)
    want = {}
    for fid, wkt in [(1, "POLYGON ((0 0, 50 0, 50 100, 0 100, 0 0))"),
                     (2, "POLYGON ((50 0, 100 0, 100 100, 50 100, 50 0))")]:
        want[fid] = ev.filter(st_predicate(wkt, "coveredby", points=True,
                                           t_query="any")).count()
    assert got == {k: v for k, v in want.items() if v > 0}


def test_stream_stream_join_matches_batch(spark, stream_dir):
    """Stream⋈stream spatial join (cell equality + event-time range +
    point-equality refine) over two event substreams must equal the
    batch self-join with the same condition."""
    from stark_spark.streaming import st_stream_stream_join
    path, schema = stream_dir
    a = read_event_stream(spark, path, schema, max_files=3) \
        .where(F.col("event_id") % 2 == 0)
    b = read_event_stream(spark, path, schema, max_files=3) \
        .where(F.col("event_id") % 3 == 0)
    out = st_stream_stream_join(a, b, grid=GRID, watermark="10 minutes",
                                time_range="1 hour")
    name = _run_append(out.select("event_id", "event_id_r"))
    got = {(r.event_id, r.event_id_r)
           for r in spark.sql(f"SELECT * FROM {name}").collect()}

    ev = D.load(spark, "/root/testdata/sf0.001", "events")
    ev = (ev.withColumn("x", F.col("value"))
            .withColumn("y", (F.col("user_id").cast("long") * 7919 % 1000) / 10.0))
    l = ev.where(F.col("event_id") % 2 == 0).alias("l")
    r = ev.where(F.col("event_id") % 3 == 0).alias("r")
    want = {(x.event_id, x.event_id_r) for x in
            l.join(r, (F.col("l.x") == F.col("r.x")) &
                      (F.col("l.y") == F.col("r.y")) &
                      (F.abs(F.col("l.ts").cast("long") -
                             F.col("r.ts").cast("long")) <= 3600))
             .select(F.col("l.event_id").alias("event_id"),
                     F.col("r.event_id").alias("event_id_r")).collect()}
    assert got == want and len(got) > 0


def test_stream_dedup_one_row_per_key(spark, stream_dir):
    """Watermarked streaming dedup: exactly one surviving row per key
    across micro-batches; key set equals the batch distinct set."""
    from stark_spark.streaming import stream_dedup
    path, schema = stream_dir
    s = read_event_stream(spark, path, schema, max_files=2)
    keyed = s.withColumn("k", F.col("event_id") % 50)
    out = stream_dedup(keyed, key_cols=("k",), time_col="ts",
                       watermark="365 days")
    name = _run_append(out.select("k", "event_id"))
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    ev = D.load(spark, "/root/testdata/sf0.001", "events")
    want_keys = {r.k for r in
                 ev.select((F.col("event_id") % 50).alias("k"))
                   .distinct().collect()}
    assert set(got.k) == want_keys
    assert got.k.value_counts().max() == 1
    # survivors are real input rows (key consistency)
    assert ((got.event_id % 50) == got.k).all()


def test_stream_deterministic_sample_and_split(spark, stream_dir):
    """Sampling/splitting are stateless md5-threshold exprs, so they
    apply to streams unchanged — micro-batched output must equal the
    batch computation row-for-row."""
    from stark_spark.operators.sampling import (deterministic_sample,
                                                train_test_split)
    path, schema = stream_dir
    s = read_event_stream(spark, path, schema, max_files=2)
    out = train_test_split(
        deterministic_sample(s, "event_id", 0.3), "event_id", 0.25)
    name = _run_append(out.select("event_id", "split"))
    got = {(r.event_id, r.split)
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    ev = D.load(spark, "/root/testdata/sf0.001", "events")
    want = {(r.event_id, r.split) for r in
            train_test_split(deterministic_sample(ev, "event_id", 0.3),
                             "event_id", 0.25)
            .select("event_id", "split").collect()}
    assert got == want and len(got) > 0


@pytest.fixture(scope="module")
def ordered_stream_dir(spark, tmp_path_factory):
    """events written as 6 files in EVENT-TIME order (sequential
    appends so file mtimes are increasing — the file source replays
    them oldest-first).  Stateful operators need this: a real stream
    is roughly time-ordered with bounded lateness; the randomly
    partitioned ``stream_dir`` makes every batch span the whole month,
    so batch 1 advances the watermark to ~global-max and the engine
    (correctly) drops batch 2+ as late."""
    import time

    d = tmp_path_factory.mktemp("ostream") / "events"
    ev = D.load(spark, "/root/testdata/sf0.001", "events")
    ev = (ev.withColumn("x", F.col("value"))
            .withColumn("y", (F.col("user_id").cast("long") * 7919 % 1000) / 10.0))
    cuts = [r[0] for r in
            ev.selectExpr("percentile(cast(ts as double), "
                          "array(1/6, 2/6, 3/6, 4/6, 5/6))").collect()[0]][0:]
    bounds = [float("-inf")] + list(cuts) + [float("inf")]
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        (ev.where((F.col("ts").cast("double") >= lo) &
                  (F.col("ts").cast("double") < hi))
           .coalesce(1).write.mode("append").parquet(str(d)))
        time.sleep(1.1)  # distinct mtimes -> deterministic replay order
    return str(d), ev.schema


def test_stream_sessionize_matches_batch(spark, ordered_stream_dir):
    """Closed streaming sessions == batch gaps-and-islands sessions
    (operators.temporal_join.sessionize) for every session the final
    watermark has closed; open state is held back, and nothing is
    emitted that batch doesn't know."""
    from stark_spark.operators.temporal_join import sessionize
    from stark_spark.streaming import stream_sessionize

    path, schema = ordered_stream_dir
    s = read_event_stream(spark, path, schema, max_files=1)
    out = stream_sessionize(s, key="user_id", time_col="ts",
                            gap=7200, watermark="1 hour")
    name = _run_append(out)
    got = {(r.key, str(r.sess_start), str(r.sess_end), r.n)
           for r in spark.sql(f"SELECT * FROM {name}").collect()}

    ev = D.load(spark, "/root/testdata/sf0.001", "events")
    ev = ev.withColumn("_es", F.col("ts").cast("long"))
    lab = sessionize(ev, "user_id", "_es", 7200)
    batch = (lab.groupBy("user_id", "session_id")
                .agg(F.min("ts").alias("sess_start"),
                     F.max("ts").alias("sess_end"),
                     F.count("*").alias("n")))
    all_batch = {(r.user_id, str(r.sess_start), str(r.sess_end), r.n)
                 for r in batch.collect()}
    # deterministic guarantee: a session followed by a LATER event of
    # the same key always emits (closed in-stream when that event
    # arrives); each key's final session may stay in state if no batch
    # runs after its timeout passes the watermark (availableNow ends).
    last_per_key = {}
    for t in all_batch:
        if t[0] not in last_per_key or t[1] > last_per_key[t[0]][1]:
            last_per_key[t[0]] = t
    must_emit = all_batch - set(last_per_key.values())
    assert must_emit <= got, must_emit - got
    assert got <= all_batch, got - all_batch
    assert len(got) > 0


def test_state_store_rows_scale_with_keys(spark, stream_dir):
    """Statefulness bound: the custom stateful operator's state store
    must hold one row per KEY (grid cell), not per event — unbounded
    per-event state is the classic streaming scale killer. Checked
    against the query's own progress metrics (stateOperators), which
    is exactly what an operator dashboard alarms on at scale."""
    path, schema = stream_dir
    s = read_event_stream(spark, path, schema, max_files=2)
    out = stateful_cell_extremes(s, GRID)
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    progress = [p for p in q.recentProgress
                if p.get("stateOperators")]
    assert progress, "no stateful progress recorded"
    n_events = D.load(spark, "/root/testdata/sf0.001", "events").count()
    n_cells = 8 * 8
    for p in progress:
        for op in p["stateOperators"]:
            rows = op.get("numRowsTotal", 0)
            assert rows <= n_cells, (
                f"state rows {rows} exceed key count {n_cells} — "
                f"state is accumulating per event, not per key")
    assert n_events > n_cells  # the bound actually discriminates


def test_state_store_rows_scale_with_sessions(spark, ordered_stream_dir):
    """Sessionize state must hold at most one row per ACTIVE key
    (user), never per event: closed sessions leave the store (emitted
    + dropped), so numRowsTotal is bounded by distinct user_ids at
    every progress point."""
    from stark_spark.streaming import stream_sessionize
    path, schema = ordered_stream_dir
    s = read_event_stream(spark, path, schema, max_files=1)
    out = stream_sessionize(s, key="user_id", time_col="ts",
                            gap=7200, watermark="1 hour")
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    progress = [p for p in q.recentProgress if p.get("stateOperators")]
    assert progress, "no stateful progress recorded"
    ev = D.load(spark, "/root/testdata/sf0.001", "events")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    for p in progress:
        for op in p["stateOperators"]:
            rows = op.get("numRowsTotal", 0)
            assert rows <= n_users, (
                f"state rows {rows} exceed active-key bound {n_users}")
    assert n_events > n_users


@pytest.mark.parametrize("impl", ["literal", "jvm"])
def test_stream_contamination_matches_batch(spark, tmp_path, impl):
    """Streaming Bloom decontamination flags exactly the rows the
    batch check flags, with ZERO streaming state (stateless filter +
    stream-static join — no stateOperators in progress). Both the
    driver-built literal bitmap and the distributed-build jvm probe
    chain produce identical results."""
    from stark_spark.streaming.stream import stream_contamination
    docs = D.load(spark, "/root/testdata/sf0.001", "documents")
    ev = (docs.where(F.col("doc_id") % 10 == 0)
              .select("doc_id",
                      F.when(F.col("doc_id") % 20 == 0, F.col("text"))
                       .otherwise(F.concat(F.col("text"),
                                           F.lit(" tail")))
                       .alias("text")))
    d = str(tmp_path / "docs")
    docs.repartition(3).write.parquet(d)
    s = (spark.readStream.schema(docs.schema)
         .option("maxFilesPerTrigger", 1).parquet(d))
    out = stream_contamination(s, ev, impl=impl)
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.doc_id, r.content_hash)
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {(r.doc_id, r.h) for r in
            docs.withColumn("h", F.md5("text"))
                .join(ev.select(F.md5("text").alias("h")).distinct(),
                      "h").select("doc_id", "h").collect()}
    assert got == want and len(got) > 0
    for p in q.recentProgress:
        assert not p.get("stateOperators"), "unexpected streaming state"


def test_stream_contamination_ngrams_matches_batch(spark, tmp_path):
    """Streaming 13-gram decontamination emits exactly the batch
    rule's (doc, matching window) pairs with ZERO streaming state."""
    from stark_spark.operators.dedup import cross_ngram_contamination
    from stark_spark.streaming.stream import stream_contamination_ngrams
    docs = D.load(spark, "/root/testdata/sf0.001", "documents")
    ev = (docs.where(F.col("doc_id") % 10 == 0)
              .select("doc_id",
                      F.when(F.col("doc_id") % 20 == 0, F.col("text"))
                       .otherwise(F.concat(F.col("text"),
                                           F.lit(" tail")))
                       .alias("text")))
    d = str(tmp_path / "docs")
    docs.repartition(3).write.parquet(d)
    s = (spark.readStream.schema(docs.schema)
         .option("maxFilesPerTrigger", 1).parquet(d))
    out = stream_contamination_ngrams(s, ev, n=13)
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.doc_id, r.h)
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    # batch twin: per-doc hit COUNTS must equal the pair multiplicity
    want_counts = {r.doc_id: r.n_hit_shingles for r in
                   cross_ngram_contamination(docs, ev, "doc_id",
                                             n=13).collect()}
    got_counts: dict = {}
    for doc, _h in got:
        got_counts[doc] = got_counts.get(doc, 0) + 1
    assert got_counts == want_counts and len(got) > 0
    for p in q.recentProgress:
        assert not p.get("stateOperators"), "unexpected streaming state"


def test_stream_cms_state_bounded_and_equals_batch(spark, stream_dir):
    """Streaming CMS: state store never exceeds width·depth cells
    (bounded memory for unbounded keys), and the final sketch equals
    the batch cms_build cell-for-cell — counts are associative sums,
    so arrival order cannot move a counter."""
    from stark_spark.operators.sketch import cms_build
    from stark_spark.streaming.stream import stream_cms
    path, schema = stream_dir
    w, d = 64, 3
    s = read_event_stream(spark, path, schema, max_files=2)
    out = stream_cms(s, "user_id", width=w, depth=d)
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    progress = [p for p in q.recentProgress if p.get("stateOperators")]
    assert progress, "no stateful progress recorded"
    for p in progress:
        for op in p["stateOperators"]:
            assert op.get("numRowsTotal", 0) <= w * d
    got = {(r.row, r.bucket): r.cnt
           for r in spark.table(name).collect()}
    ev = spark.read.schema(schema).parquet(path)
    want = {(r.row, r.bucket): r.cnt
            for r in cms_build(ev, "user_id", width=w, depth=d).collect()}
    assert got == want and len(got) > 0


def test_stream_hll_state_bounded_and_equals_batch(spark, stream_dir):
    """Streaming HLL: state ≤ 256 registers for ANY key cardinality,
    and the final register table equals the batch hll_registers
    bit-for-bit (register max is associative)."""
    from stark_spark.operators.sketch import hll_registers
    from stark_spark.streaming.stream import stream_hll
    path, schema = stream_dir
    s = read_event_stream(spark, path, schema, max_files=2)
    out = stream_hll(s, "user_id")
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    progress = [p for p in q.recentProgress if p.get("stateOperators")]
    assert progress, "no stateful progress recorded"
    for p in progress:
        for op in p["stateOperators"]:
            assert op.get("numRowsTotal", 0) <= 256
    got = {(r.register, r.max_rho)
           for r in spark.table(name).collect()}
    ev = spark.read.schema(schema).parquet(path)
    want = {(r.register, r.max_rho)
            for r in hll_registers(ev, "user_id").collect()}
    assert got == want and len(got) > 0


def test_watermark_drops_late_rows(spark, tmp_path):
    """Watermark semantics as Spark ≥3.4 actually implements them
    (two watermarks): LATE-RECORD FILTERING uses the PREVIOUS
    micro-batch's watermark, EVICTION uses the current one. So a row
    arriving one batch after the advance (batch 2 here) is still
    accepted — its window state is evicted only afterwards — while a
    row arriving two batches after (batch 3) is dropped and counted
    in numRowsDroppedByWatermark. The test pins all three observable
    contracts: the metric, state eviction, and the final counts."""
    import datetime as dt
    import time as _time

    d = str(tmp_path / "wm")
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    mk = lambda rows: spark.createDataFrame(rows, "k string, ts timestamp")
    batches = [
        mk([("a", t0), ("a", t0 + dt.timedelta(minutes=5))]),
        mk([("a", t0 + dt.timedelta(days=10))]),      # advances WM
        mk([("a", t0 + dt.timedelta(minutes=10))]),   # 1 batch after:
                                                      # still ACCEPTED
        mk([("a", t0 + dt.timedelta(minutes=20))]),   # 2 after: DROP
    ]
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(f"{d}/b{i}")
        _time.sleep(1.1)                # strictly increasing mtimes
    src = (spark.readStream.schema("k string, ts timestamp")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/b*"))
    agg = (src.withWatermark("ts", "1 hour")
              .groupBy(F.window("ts", "1 hour").alias("w"), "k")
              .agg(F.count("*").alias("cnt")))
    import uuid as _uuid
    name = f"t_{_uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
            .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    dropped = sum(op.get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress
                  for op in (p.get("stateOperators") or []))
    assert dropped == 1                  # exactly the batch-4 row
    totals = [op.get("numRowsTotal", 0)
              for p in sorted(q.recentProgress,
                              key=lambda p: p["batchId"])
              for op in (p.get("stateOperators") or [])]
    assert totals[-1] == 1               # old window evicted by WM
    from collections import defaultdict
    final = defaultdict(int)
    for r in spark.table(name).collect():
        key = (r.w.start, r.k)
        final[key] = max(final[key], r.cnt)   # update mode: counts grow
    # first window: 2 on-time rows + the one-batch-late row; the
    # two-batches-late row is gone
    assert final[(t0, "a")] == 3
    assert sum(final.values()) == 4          # 3 + the far-future row


def test_stream_semantic_contamination_matches_batch(spark, tmp_path):
    """The ingest-time semantic decontamination pair set must equal
    the batch rule's (same cluster, cos >= tau) bit-for-bit — gemm
    assignment on the stream side, fold on the static side, planted
    margins make them provably agree."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    from stark_spark.operators.similarity import cosine
    from stark_spark.streaming.stream import (
        read_event_stream, stream_semantic_contamination)

    sf = "/root/testdata/sf0.001"
    emb = E._planted_knn_corpus(spark, sf)
    ev = emb.where(F.col("vec_id") % 12 < 8)
    qs = emb.where(F.col("vec_id") % 12 >= 8)
    from stark_spark import datasets as D
    cent = (D.load(spark, sf, "embeddings")
            .where(F.col("vec_id") % 48 == 0)
            .select(F.col("vec_id").cast("long").alias("c_id"),
                    F.col("embedding").alias("c_embedding")))
    d = str(tmp_path / "arrivals")
    qs.repartition(3).write.parquet(d)
    s = read_event_stream(spark, d, qs.schema, max_files=1)
    out = stream_semantic_contamination(s, ev, cent, 0.992)
    t = E._stream_sink(out, "append")
    got = {(r.vec_id, r.eval_id): r.cos for r in t.collect()}

    batch = (qs.select(F.col("vec_id").alias("q"),
                       F.col("embedding").alias("vq"),
                       F.expr("vec_id div 12").alias("cl"))
               .join(ev.select(F.col("vec_id").alias("e"),
                               F.col("embedding").alias("ve"),
                               F.expr("vec_id div 12").alias("cl")),
                     "cl")
               .withColumn("cos", cosine(F.col("vq"), F.col("ve")))
               .where(F.col("cos") >= 0.992))
    want = {(r.q, r.e): r.cos for r in batch.collect()}
    assert got == want and len(got) > 0

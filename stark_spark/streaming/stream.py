"""Structured Streaming surface — spatio-temporal streams.

The reference is batch-only (SURVEY.md §2.8: streaming "entirely
absent"); this module is the net-new streaming tier, built so every
batch operator that is STATELESS (constant-geometry predicates, cell
assignment, text/dedup projections) applies to a streaming DataFrame
unchanged — they are ordinary column expressions. What needs streaming
machinery is aggregation state:

* watermarked tumbling/sliding windows over event time;
* session windows;
* arbitrary per-key state via ``applyInPandasWithState`` (running
  extremes per grid cell here; the pattern generalizes to any
  accumulator the reference's `rdd.aggregate` style ops expressed).

At scale: state lives in the state store keyed by (cell, window) —
small keys, bounded by watermark eviction; the spatial filter runs
BEFORE the shuffle into state, so the state store only sees rows that
survive the predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stark_spark.partitioner.grid import GridSpec


def read_event_stream(spark: SparkSession, path: str, schema,
                      *, max_files: int = 10) -> DataFrame:
    """File-based event stream (one new parquet file per micro-batch
    unit; the cloud equivalent is Kafka/Kinesis — same DataFrame out)."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files)
            .parquet(path))


def st_stream_filter(stream: DataFrame, query, predicate: str = "intersects",
                     *, points: bool = False, t_query=None,
                     x: str = "x", y: str = "y") -> DataFrame:
    """Stateless ST predicate on a stream — the batch expression as-is.
    Raw point streams (x/y columns, no bbox) get native bbox columns
    attached first."""
    from stark_spark.functions.constructors import with_bbox
    from stark_spark.functions.predicates import st_predicate
    if "xmin" not in stream.columns and x in stream.columns:
        stream = with_bbox(stream, x=x, y=y)
    return stream.filter(st_predicate(query, predicate, points=points,
                                      t_query=t_query if t_query else "any"))


def windowed_stats(stream: DataFrame, *, time_col: str = "ts",
                   window: str = "1 hour", slide: str | None = None,
                   watermark: str = "30 minutes",
                   keys: tuple[str, ...] = (),
                   value_col: str = "value") -> DataFrame:
    """Watermarked tumbling/sliding window aggregation: count + sum +
    max of ``value_col`` per (window, keys). Late rows beyond the
    watermark are dropped by the engine; sums use the cents-long trick
    so results are deterministic under any arrival order."""
    w = (F.window(F.col(time_col), window, slide) if slide
         else F.window(F.col(time_col), window))
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (stream.withWatermark(time_col, watermark)
            .groupBy(w.alias("win"), *[F.col(k) for k in keys])
            .agg(F.count("*").alias("n"),
                 (F.sum(cents) / 100.0).alias("sum_value"),
                 F.max(cents).alias("max_cents"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    *keys, "n", "sum_value", "max_cents"))


def windowed_cell_counts(stream: DataFrame, grid: GridSpec, *,
                         time_col: str = "ts", window: str = "1 hour",
                         watermark: str = "30 minutes",
                         x: str = "x", y: str = "y") -> DataFrame:
    """Per-grid-cell event counts per window — the streaming form of the
    partitioner histogram (`GridPartitioner.scala:260-315`); feeds
    cost-based partitioning decisions continuously."""
    cell = grid.cell_expr(F.col(x), F.col(y)).alias("cell")
    return (stream.withWatermark(time_col, watermark)
            .groupBy(F.window(F.col(time_col), window).alias("win"), cell)
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("win_start"), "cell", "n"))


def session_stats(stream: DataFrame, *, time_col: str = "ts",
                  gap: str = "30 minutes", watermark: str = "30 minutes",
                  key: str = "user_id") -> DataFrame:
    """Session windows per key (gap-based)."""
    return (stream.withWatermark(time_col, watermark)
            .groupBy(F.session_window(F.col(time_col), gap).alias("sw"),
                     F.col(key))
            .agg(F.count("*").alias("n"))
            .select(F.col("sw.start").alias("sess_start"),
                    F.col("sw.end").alias("sess_end"), key, "n"))


def geofence_counts(stream: DataFrame, fences: DataFrame, *,
                    fence_key: str = "fence_id", time_col: str = "ts",
                    window: str = "1 hour", watermark: str = "30 minutes",
                    x: str = "x", y: str = "y") -> DataFrame:
    """Streaming spatial join + rollup: events assigned to the
    geofence polygons covering them (stream-static broadcast join —
    the fence table is dim-sized), counted per (fence, window).

    The spatial join is the engine's standard broadcast path
    (`st_join(broadcast=True)`), legal on a stream because it is
    stateless; only the windowed count holds state."""
    from stark_spark.functions.constructors import st_point, with_bbox
    from stark_spark.operators.join import st_join

    if "xmin" not in stream.columns:
        stream = with_bbox(stream, x=x, y=y)
    if "geom" not in stream.columns:
        stream = stream.withColumn("geom", st_point(F.col(x), F.col(y)))
    joined = st_join(stream, fences, "coveredby", broadcast=True,
                     left_points=True)
    return (joined.withWatermark(time_col, watermark)
            .groupBy(F.window(F.col(time_col), window).alias("win"),
                     F.col(fence_key))
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("win_start"), fence_key, "n"))


def stateful_cell_extremes(stream: DataFrame, grid: GridSpec, *,
                           x: str = "x", y: str = "y",
                           value_col: str = "value",
                           timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    (count, min, max) per grid cell across ALL micro-batches — the
    streaming equivalent of the reference's accumulator-style
    `rdd.aggregate` ops (KNN/Skyline accumulators, PSF:152-175/496-517),
    with explicit state instead of a shuffle-per-batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState
    from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                                   StructField, StructType)

    out_schema = StructType([
        StructField("cell", IntegerType()), StructField("n", LongType()),
        StructField("v_min", DoubleType()), StructField("v_max", DoubleType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()), StructField("v_min", DoubleType()),
        StructField("v_max", DoubleType()),
    ])

    def update(key, pdfs, state: GroupState):
        n, vmin, vmax = (state.get if state.exists else (0, None, None))
        for pdf in pdfs:
            v = pdf[value_col]
            if len(v):
                n += len(v)
                bmin, bmax = float(v.min()), float(v.max())
                vmin = bmin if vmin is None else min(vmin, bmin)
                vmax = bmax if vmax is None else max(vmax, bmax)
        state.update((n, vmin, vmax))
        yield pd.DataFrame({"cell": [key[0]], "n": [n],
                            "v_min": [vmin], "v_max": [vmax]})

    cells = stream.withColumn(
        "cell", grid.cell_expr(F.col(x), F.col(y)))
    return (cells.groupBy("cell")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", "NoTimeout"))


def stream_sessionize(stream: DataFrame, *, key: str = "user_id",
                      time_col: str = "ts", gap: int = 7200,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization with per-key state — the streaming
    twin of the batch gaps-and-islands ``sessionize``
    (operators/temporal_join.py): one output row PER CLOSED SESSION
    ``(key, sess_start, sess_end, n)``, where a session closes when a
    larger-than-``gap``-seconds quiet period follows it.

    Unlike the ``session_window`` aggregate (`session_stats`), this is
    arbitrary stateful logic via ``applyInPandasWithState``: state per
    key is the open session triple (start, last, n) — O(1) per key —
    and an EVENT-TIME TIMEOUT set to ``last + gap`` closes idle
    sessions when the watermark passes, so state is evicted exactly
    when a session can no longer grow. Sessions that close mid-batch
    (a later event in the same batch starts the next one) emit
    immediately.

    At scale: one shuffle per batch on ``key`` into the state store;
    state volume = number of concurrently-open sessions, independent
    of history length.
    """
    import pandas as pd
    from pyspark.sql.types import (LongType, StructField, StructType,
                                   TimestampType)

    out_schema = StructType([
        StructField("key", LongType()),
        StructField("sess_start", TimestampType()),
        StructField("sess_end", TimestampType()),
        StructField("n", LongType()),
    ])
    state_schema = StructType([
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ])
    gap_us = gap * 1_000_000

    def _row(k, start_us, last_us, n):
        return pd.DataFrame(
            {"key": [k],
             "sess_start": [pd.Timestamp(start_us, unit="us")],
             "sess_end": [pd.Timestamp(last_us, unit="us")],
             "n": [n]})

    def update(key, pdfs, state):
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _row(key[0], start_us, last_us, n)
            return
        ts = pd.concat([pdf[time_col] for pdf in pdfs])
        us = (ts.astype("int64") // 1_000).sort_values().to_numpy()
        start_us, last_us, n = state.get if state.exists else (None, 0, 0)
        closed = []
        for t in us:
            t = int(t)
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = max(last_us, t), n + 1
        wm_us = state.getCurrentWatermarkMs() * 1000
        if start_us is not None and last_us + gap_us <= wm_us:
            # the timeout we'd set is already in the past (watermark
            # advanced past it within this batch) — close immediately
            closed.append((start_us, last_us, n))
            state.remove()
        else:
            state.update((start_us, last_us, n))
            # ceil to ms so the timeout never fires before last + gap
            state.setTimeoutTimestamp(-((last_us + gap_us) // -1000))
        for c in closed:
            yield _row(key[0], *c)

    s = stream.withWatermark(time_col, watermark)
    return (s.groupBy(F.col(key))
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "append", "EventTimeTimeout"))


def stream_dedup(stream: DataFrame, *, key_cols=("fingerprint",),
                 time_col: str = "ts",
                 watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup — the ingest-time counterpart of the
    batch dedup tier (operators/dedup.py): first arrival per key wins,
    later duplicates within the watermark horizon are dropped, and the
    engine evicts key state past the watermark (bounded state at any
    ingest volume). For content dedup, key on
    ``operators.text.fingerprint(text)`` / ``md5(text)`` — stateless
    column exprs that apply to streams unchanged.
    """
    s = (stream.withColumn("_ts", F.col(time_col).cast("timestamp"))
               .withWatermark("_ts", watermark))
    return s.dropDuplicatesWithinWatermark(list(key_cols)).drop("_ts")


def stream_ingest_dedup(stream: DataFrame, index_fp: DataFrame, *,
                        key: str = "doc_id", fp_col: str = "fp",
                        index_key: str | None = None,
                        max_hamming: int = 3) -> DataFrame:
    """NEAR-dup detection at INGEST against a persisted fingerprint
    index — the streaming twin of `dedup.hamming_near_join` (which
    itself is the incremental twin of the batch self-join): each
    arriving document's 64-bit fingerprint is pigeonhole-banded
    STATELESSLY (explode is a plain projection), stream-static
    equi-joined against the banded static index, and exact-verified
    with bit_count. A fingerprint within hamming d matches in up to
    d+1 bands, so the band multiplicity is collapsed by ONE streaming
    aggregation — groupBy(new_key, index_key) → min(hamming), which
    is exact (hamming is a pure function of the pair) and the query's
    only stateful operator. Output: (new_key, index_key, hamming),
    identical rows to the batch `hamming_near_join` on the same data
    — for ANY input: both twins collapse to min(hamming) per KEY
    pair (r12 ADVICE), so duplicate keys (multiple fingerprints per
    key) agree too.

    Scale shape: the index bands once (localCheckpoint; on a real
    cluster persist to storage and reload per restart) and the join
    is per-micro-batch map work against it; group state is pair-
    scale per batch — in production put a watermark on arrival time
    upstream so the engine can evict, exactly as `stream_dedup`
    does for the exact tier."""
    from stark_spark.operators.dedup import _banded_fp
    ik = index_key or key
    idx = (_banded_fp(index_fp, ik, fp_col, max_hamming + 1)
           .select(F.col(ik).alias("index_key"),
                   F.col("fp").alias("fp_b"), "band", "bucket")
           .localCheckpoint())
    s = (_banded_fp(stream, key, fp_col, max_hamming + 1)
         .select(F.col(key).alias("new_key"),
                 F.col("fp").alias("fp_a"), "band", "bucket"))
    j = (s.join(idx, ["band", "bucket"])
          .withColumn("hamming",
                      F.bit_count(F.col("fp_a").bitwiseXOR(
                          F.col("fp_b"))))
          .where(F.col("hamming") <= max_hamming))
    return (j.groupBy("new_key", "index_key")
             .agg(F.min("hamming").cast("long").alias("hamming")))


def st_stream_stream_join(left: DataFrame, right: DataFrame, *,
                          grid: GridSpec,
                          left_time: str = "ts", right_time: str = "ts",
                          watermark: str = "30 minutes",
                          time_range: str = "1 hour",
                          suffix: str = "_r",
                          left_x: str = "x", left_y: str = "y",
                          right_x: str = "x", right_y: str = "y") -> DataFrame:
    """Stream ⋈ stream spatial join (net-new; Spark's stream-stream
    join requires an equality key + event-time bound, which is exactly
    the batch grid join's shape):

    * equality key = the grid CELL of each side (native expr);
    * event-time range condition bounds the state the engine must keep
      (rows wait at most ``time_range`` for partners);
    * both sides watermarked → state eviction is automatic.

    Join condition: same cell ∧ |t_l − t_r| ≤ time_range ∧ exact
    point-equality refine (same native comparisons as the batch path).
    At scale the state store is keyed by cell — the same partitioning
    story as the batch join, just with time-bounded buffers.
    """
    lt, rt = "_lts", "_rts"
    l = (left.withColumn(lt, F.col(left_time).cast("timestamp"))
             .withColumn("_cell", grid.cell_expr(F.col(left_x), F.col(left_y)))
             .withWatermark(lt, watermark))
    ren = {c: c + suffix for c in right.columns if c in left.columns}
    r = right
    for old, new in ren.items():
        r = r.withColumnRenamed(old, new)
    rx = right_x + suffix if right_x in ren else right_x
    ry = right_y + suffix if right_y in ren else right_y
    rtime = right_time + suffix if right_time in ren else right_time
    r = (r.withColumn(rt, F.col(rtime).cast("timestamp"))
          .withColumn("_cell_r", grid.cell_expr(F.col(rx), F.col(ry)))
          .withWatermark(rt, watermark))
    cond = ((F.col("_cell") == F.col("_cell_r")) &
            (F.col(rt) >= F.col(lt) - F.expr(f"INTERVAL {time_range}")) &
            (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {time_range}")) &
            (F.col(left_x) == F.col(rx)) & (F.col(left_y) == F.col(ry)))
    return l.join(r, cond, "inner").drop("_cell", "_cell_r", lt, rt)


def stream_contamination(stream: DataFrame, eval_df: DataFrame, *,
                         key: str = "doc_id", text_col: str = "text",
                         fpp: float = 1e-3,
                         impl: str = "literal") -> DataFrame:
    """Decontaminate a document STREAM at ingest — the streaming twin
    of `dedup.cross_bloom_dups`: a Bloom prefilter over the static
    eval corpus runs STATELESS inside each micro-batch (no streaming
    state at all), so ~fpp of clean traffic survives to the closing
    stream-static equi-join against the true eval hashes, which
    removes the false positives. Output: the contaminated stream rows
    (key, content_hash) — exactly the rows a batch recheck would flag,
    caught before they ever land in the corpus.

    Two physically-different builds, identical semantics (mirroring
    the batch twin's ``impl`` switch):

    - ``impl="literal"`` (default, small eval sets): driver-built
      bitmap applied as a literal-array + ``getbit`` codegen
      expression; caps at ~1M eval rows (~1.8 MB of plan literal).
      PRECONDITION: eval_df must be deterministic — its hashes are
      collected ONCE here and reused for both the filter and the
      closing join; the collected snapshot is what every micro-batch
      is checked against.
    - ``impl="jvm"`` (large eval sets — full benchmark suites): the
      filter words are built DISTRIBUTED (`dedup.bloom_words_df`:
      explode into bit positions → bit_or tree-aggregate, no driver
      collect, no plan literal at any eval size) and probed inside
      each micro-batch via ONE single-row stream-static broadcast of
      the dense word array + k getbit probes
      (`dedup._bloom_probe_array` — still stateless: the static side
      is a checkpointed local-block frame). The
      eval hash set is `localCheckpoint`ed ONCE up front and serves
      as BOTH the filter source and the closing-join truth side, so
      the determinism precondition disappears and the eval pipeline
      is never re-evaluated per micro-batch — each batch reads the
      checkpoint blocks.

    At scale: the closing stream-static join shuffles only Bloom
    survivors (~fpp of each batch + true matches), so ingest
    decontamination against a 100M-row eval suite is a broadcast-probe
    chain plus an eval-sized equi-join — the same 100 TB shape as the
    batch path."""
    from stark_spark.operators.dedup import (_bloom_probe_array,
                                             _bloom_sizing, bloom_build,
                                             bloom_might_contain,
                                             bloom_words_df)
    ev_hash = F.md5(F.col(text_col))
    hashed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    if impl == "literal":
        hashes = [r.h for r in
                  eval_df.select(ev_hash.alias("h")).distinct().collect()]
        words, m, k = bloom_build(hashes, fpp)
        flagged = hashed.where(bloom_might_contain(
            "content_hash", words, m, k))
        truth = stream.sparkSession.createDataFrame(
            [(h,) for h in hashes], "content_hash string")
    elif impl == "jvm":
        ev_hashes = (eval_df.select(ev_hash.alias("h")).distinct()
                     .localCheckpoint(eager=True))
        n = ev_hashes.count()
        m, k = _bloom_sizing(n, fpp)
        flagged = _bloom_probe_array(hashed, "content_hash",
                                     bloom_words_df(ev_hashes, m, k),
                                     m, k)
        truth = ev_hashes.select(F.col("h").alias("content_hash"))
    else:
        raise ValueError(f"unknown bloom impl: {impl!r}")
    return flagged.join(truth, "content_hash") \
                  .select(key, "content_hash")


def stream_contamination_ngrams(stream: DataFrame, eval_df: DataFrame,
                                *, key: str = "doc_id",
                                text_col: str = "text",
                                n: int = 13) -> DataFrame:
    """Token-n-gram decontamination AT INGEST — the streaming twin of
    `dedup.cross_ngram_contamination` (the GPT-3/PaLM 13-gram rule):
    each arriving document explodes into its per-doc DISTINCT n-token
    window hashes (native expressions inside the micro-batch) and
    joins the static eval shingle set — a STATELESS stream-static
    equi-join, so there is zero streaming state and nothing to evict.

    The eval shingle set is built once (per-doc distinct → global
    distinct) and `localCheckpoint`ed, so micro-batches re-read its
    blocks instead of re-evaluating the eval pipeline.

    Output: one row per (doc, matching window) — (<key>, h). The
    per-doc distinct explode makes (key, h) unique, so downstream
    consumers can count hits per doc with a plain batch aggregate
    (an in-stream groupBy would force stateful complete/update mode
    for no ingest-side benefit)."""
    from stark_spark.operators.dedup import _doc_shingle_rows
    ev_sh = (_doc_shingle_rows(eval_df, n, text_col)
             .distinct()
             .localCheckpoint(eager=True))
    tr = _doc_shingle_rows(stream, n, text_col, key)
    return tr.join(ev_sh, "h").select(key, "h")


def stream_semantic_contamination(stream: DataFrame, eval_df: DataFrame,
                                  centroids: DataFrame, tau: float, *,
                                  key: str = "vec_id",
                                  vec_col: str = "embedding",
                                  assign_score: str = "fold") -> DataFrame:
    """Embedding-level decontamination at ingest — the streaming twin
    of `similarity.semantic_contamination` and the semantic sibling
    of `stream_contamination` (exact/Bloom) and
    `stream_contamination_ngrams`: arriving vectors are flagged when
    they are cosine-near-duplicates (≥ ``tau``) of ANY static eval
    vector in the same centroid cluster — paraphrase-level leakage
    the text hashes miss, caught before the row lands in the corpus.

    Fully STATELESS: per-batch centroid assignment runs through
    `ivf_assign(score="gemm")` (mapInPandas with the centroid matrix
    in the task closure — no window, no crossJoin, legal on a
    stream), then one stream-static equi-join on the bucket id
    against the checkpointed, pre-assigned eval members and a fold-
    cos refine. No watermark, no streaming state; per-batch cost is
    |batch| · |eval ∩ bucket|. Output: one row per (arriving vector,
    matching eval vector) — ``(key, eval_id, cos)``; aggregate
    downstream if a verdict-per-vector is wanted.

    The eval side is dim-sized BY CONTRACT (a benchmark suite), so
    its assigned form localCheckpoints once up front and every
    micro-batch reads the checkpoint blocks — the eval pipeline is
    never re-evaluated per batch. ``assign_score`` picks the eval
    side's one-off assignment engine: "fold" (bit-exact argmax
    tie-break) or "gemm" (BLAS — the large-C choice; at C ≈ √N
    centroids the fold is N·C interpreted evals). Near-tie ulp
    divergence between the two is the usual IVF caveat
    (`ivf_assign` docstring); the scored cos is fold either way."""
    from stark_spark.operators.similarity import (_cos_pre, ivf_assign,
                                                  norm)
    # the eval-side norm is materialized INTO the checkpoint (one
    # fold per eval row, once per query) and the arriving side's norm
    # is one fold per batch row — the refine then folds once per
    # joined PAIR instead of three times (dot + both norms), which is
    # the per-batch hot loop (guide §4; bit-identical values)
    ev = (ivf_assign(eval_df, centroids, key=key, vec_col=vec_col,
                     score=assign_score)
          .select(F.col(key).alias("eval_id"),
                  F.col(vec_col).alias("_evv"), "bucket",
                  norm(F.col(vec_col)).alias("_evn"))
          .localCheckpoint(eager=True))
    s = (ivf_assign(stream, centroids, key=key, vec_col=vec_col,
                    score="gemm")
         .withColumn("_sn", norm(F.col(vec_col))))
    return (s.join(ev, "bucket")
             .withColumn("cos", _cos_pre(F.col(vec_col), F.col("_evv"),
                                         F.col("_sn"), F.col("_evn")))
             .where(F.col("cos") >= tau)
             .select(key, "eval_id", "cos"))


def stream_quality_filter(stream: DataFrame, *, key: str = "doc_id",
                          text_col: str = "text",
                          min_tokens: int = 20,
                          max_tokens: int = 100_000) -> DataFrame:
    """Ingest-time quality gating: the Gopher-rule flags
    (`operators.text.gopher_flags`) are pure codegen column
    expressions, so they run INSIDE each micro-batch with zero
    streaming state — the curation shape where junk is dropped at the
    firehose before it ever reaches storage or a shuffle.

    Emits the REJECT stream (documents failing any rule) with the
    per-rule flags — the quarantine-sink side of the pipeline; the
    keep side is the complement filter on the same expressions.
    Output: (key, n_tokens, flag_len, flag_word_len, flag_alpha,
    flag_stop)."""
    from stark_spark.operators.text import gopher_flags, tokens
    t = F.col(text_col)
    fl = gopher_flags(t, min_tokens=min_tokens, max_tokens=max_tokens)
    n = F.size(F.filter(tokens(t), lambda w: w != F.lit("")))
    keep = (fl["flag_len"] & fl["flag_word_len"] & fl["flag_alpha"]
            & fl["flag_stop"])
    return (stream.select(
                F.col(key), n.cast("long").alias("n_tokens"),
                fl["flag_len"].alias("flag_len"),
                fl["flag_word_len"].alias("flag_word_len"),
                fl["flag_alpha"].alias("flag_alpha"),
                fl["flag_stop"].alias("flag_stop"),
                keep.alias("_keep"))
            .where(~F.col("_keep"))
            .drop("_keep"))


def stream_ohlc(stream: DataFrame, *, series: str = "event_type",
                time_col: str = "ts", value: str = "value",
                tie_col: str = "event_id", window: str = "1 hour",
                watermark: str = "1 hour") -> DataFrame:
    """Streaming OHLC candles per (series, tumbling window) — the
    streaming twin of `operators.timeseries.ohlc_bars`.

    The reason OHLC is safe to compute on a stream at all: open/close
    are NOT "first/last to arrive" but min/max over a (event-time,
    tie, cents) struct — order-insensitive, associative aggregates, so
    the result is identical under any micro-batch arrival order and
    matches the batch operator bit-for-bit once the window closes.
    All state is per-(series, window) aggregate state, bounded by the
    watermark horizon.

    Output: (win_start, win_end, series, open_c, high_c, low_c,
    close_c, n, vol_c) — *_c on the exact cents grid."""
    us = F.unix_micros(F.col(time_col))
    vc = F.round(F.col(value) * 100).cast("long")
    pick = F.struct(us.alias("us"), F.col(tie_col).alias("tie"),
                    vc.alias("vc"))
    return (stream.withWatermark(time_col, watermark)
            .groupBy(F.window(F.col(time_col), window).alias("win"),
                     F.col(series).alias("series"))
            .agg(F.min(pick).getField("vc").alias("open_c"),
                 F.max(vc).alias("high_c"),
                 F.min(vc).alias("low_c"),
                 F.max(pick).getField("vc").alias("close_c"),
                 F.count("*").alias("n"),
                 F.sum(vc).alias("vol_c"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "series", "open_c", "high_c", "low_c", "close_c",
                    "n", "vol_c"))


def stream_score_outliers(stream: DataFrame, thresholds: DataFrame, *,
                          key: str = "event_id",
                          group: str = "event_type",
                          value: str = "value", k: int = 3) -> DataFrame:
    """Model-apply at ingest: per-group robust thresholds fit OFFLINE
    (`operators.anomaly.robust_thresholds` — median/MAD on the cents
    grid) broadcast onto the stream; alert rows emitted inside each
    micro-batch with ZERO streaming state — a stream-static broadcast
    join plus a codegen integer filter. This is the standard
    train-offline / score-at-the-firehose split: the stream never
    recomputes the medians, so no unbounded state, no watermark
    needed, and the alert set equals the batch detector's on the same
    rows. Output: (key, group, value_c, med_c, mad_c, dev).

    The thresholds frame is materialized (eager ``localCheckpoint``)
    before entering the stream plan: a micro-batch re-executes every
    static subtree it broadcasts, so an un-materialized thresholds
    pipeline (a full median/MAD window pass over the training corpus)
    would re-run PER BATCH (r14 instrumentation: ~0.5 s of each
    0.9 s addBatch). With the checkpoint each batch re-broadcasts a
    group-count-sized local frame — the same static-side discipline
    as `stream_contamination`'s eval checkpoint."""
    base = stream.select(
        F.col(key), F.col(group),
        F.round(F.col(value) * 100).cast("long").alias("value_c"))
    thresholds = thresholds.localCheckpoint(eager=True)
    return (base.join(F.broadcast(thresholds), group)
                .withColumn("dev",
                            F.abs(F.col("value_c") - F.col("med_c")))
                .where(F.col("dev") > F.lit(k) * F.col("mad_c"))
                .select(key, group, "value_c", "med_c", "mad_c", "dev"))


def stream_cms(stream: DataFrame, col: str, *, width: int = 512,
               depth: int = 4) -> DataFrame:
    """Streaming Count-Min sketch — the frequency sketch at the
    firehose: the batch `sketch.cms_build` cell aggregation run as a
    streaming aggregation. Because a CMS cell is a plain SUM (counts
    are associative and commutative), ANY micro-batch arrival order
    converges to the batch sketch bit-for-bit, and the state store
    holds at most width·depth counter cells — bounded regardless of
    throughput or stream lifetime, no watermark needed. This is the
    canonical "unbounded keys, bounded memory" streaming pattern:
    track frequencies of arbitrarily many distinct keys in O(w·d)
    state, answer point queries with `sketch.cms_estimate` against
    the (tiny, always-current) sink table."""
    from stark_spark.operators.sketch import _cms_bucket
    rows = F.array(*[
        F.struct(F.lit(d).cast("long").alias("row"),
                 _cms_bucket(F.col(col), d, width).alias("bucket"))
        for d in range(depth)])
    return (stream.select(F.explode(rows).alias("c"))
                  .groupBy(F.col("c.row").alias("row"),
                           F.col("c.bucket").alias("bucket"))
                  .agg(F.count("*").alias("cnt")))


def stream_hll(stream: DataFrame, col: str,
               group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Streaming HyperLogLog registers — distinct counting at the
    firehose with bounded state: the batch `sketch.hll_registers`
    aggregation (per-(group, register) max-rho) run as a streaming
    aggregation. HLL merge IS register-wise max — associative and
    commutative — so any micro-batch arrival order converges to the
    batch register table bit-for-bit, and state is capped at
    groups × 256 rows regardless of how many distinct keys flow
    through. Feed the (tiny, always-current) sink table to
    `sketch.hll_estimate` for the estimate."""
    from stark_spark.operators.sketch import (HLL_M, HLL_SUFFIX_BITS,
                                              kmv_hash)
    h = kmv_hash(F.col(col)).alias("h")
    base = stream.select(*group_cols, h)
    reg = (base
           .withColumn("register", F.expr(f"h % {HLL_M}L").cast("long"))
           .withColumn("suffix", F.expr(f"h div {HLL_M}L"))
           .withColumn(
               "rho",
               (F.lit(HLL_SUFFIX_BITS + 1)
                - F.length(F.expr(
                    "trim(LEADING '0' FROM bin(suffix))"))).cast("long")))
    return (reg.groupBy(*group_cols, "register")
               .agg(F.max("rho").alias("max_rho")))

"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Queries come from ``__spark_entry__.queries()`` — the same DataFrames
the correctness gate checks — executed with ``count()`` (full pipeline,
no driver transfer). Env: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the headline subset: every engine tier, nothing quadratic-in-corpus.
# PINNED as of round 3 (38 queries): keep this list verbatim so
# cross-round BENCH_r{N}.json comparisons are a column diff — new
# gates get appended, never substituted.
BENCH_QUERIES = [
    "st_filter_rect_timed",      # native-only ST filter
    "st_filter_polygon_timed",   # convex polygon → native half-planes
    "st_filter_coveredby_poly",  # covers family, same native path
    "st_filter_z_range",         # 3-D points, native z columns
    "st_join_grid_points",       # grid cell equi-join
    "st_join_poly_contains",     # explode + refine UDF join
    "within_distance_join",      # widened-cell distance join
    "knn_events",                # TakeOrderedAndProject top-k
    "knn_hausdorff_st",          # combined ST Hausdorff ordering
    "knn_join",                  # window top-k per key + fallback
    "knn_join_sparse",           # zero-candidate fallback path
    "interval_join",             # time-bin equi-join
    "interval_join_open",        # NULL-end intervals, in-plan cap
    "as_of_join",                # union + window sweep
    "skyline",                   # two-stage pareto front
    "dbscan",                    # cell+halo clustering + CC
    "grid_cell_histogram",       # partitioner histogram
    "raster_count_value",        # SMA-skippable pixel scan
    "raster_join_vector_clip",   # tile ⋈ geometry + pixel clip
    "agg_pricing_summary",       # columnar agg (lineitem)
    "agg_revenue_by_segment",    # broadcast dim join + agg
    "events_daily",              # temporal rollup
    "text_profile",              # native text analysis pass
    "text_repetition",           # Gopher-style repetition gates
    "dedup_minhash_sigs",        # explode + map-side-combine min
    "dedup_clusters",            # simhash pairs -> CC keep-list
    "pack_shards",               # two-phase distributed prefix sum
    "sample_stratified",         # row-local deterministic sampling
    "dedup_simhash",             # 64 native bit-votes
    "ann_brute_topk_gemm",       # batch-GEMM exact baseline
    "ann_ivf_topk_gemm",         # bucketed ANN, cogroup GEMM scorer
    "ann_knn_join_gemm",         # all-corpus neighbor graph, bucket GEMM
    "ann_dup_pairs_ivf_gemm",    # bucketed near-dup pairs, blocked GEMM
    "ann_quantized_topk",        # int8 dots, exact integer ranking
    "ann_lsh_topk",              # sign-LSH bucket + exact rerank
    "distance_histogram",        # per-cell sampled NN-distance histogram
    "events_rollup",             # GROUPING SETS multi-grain, one scan
    "token_counts",              # ws + BPE-ish regexp counters
    # appended round 4 (list is append-only; the 38 above = r3 verbatim)
    "partition_bsp",             # histogram agg + driver equal-cost split
    "kmeans_exact",              # 2 Lloyd rounds, exact integer-micros means
    "contamination_bloom",       # codegen bloom prefilter, eval-sized shuffle
    "events_gapfill",            # per-key bucket lattice + LOCF window
    "chunk_documents",           # native explode/slice chunking, no shuffle
    "sample_weighted",           # A-ES keys + TakeOrderedAndProject
    # appended round 5
    "contamination_bloom_jvm",   # distributed bloom build + broadcast probes
    "sql_st_buffer",             # buffer -> measures SQL chain (batched UDFs)
    "vocab_top_k",               # explode + combine + TakeOrdered vocab
    "doc_logprob",               # unigram LM scoring, broadcast vocab join
    "sample_group_split",        # group-hash split, row-local
    "multimodal_phash_pairs",    # decode + phash + hamming-band join
    "multimodal_audio_pairs",    # PCM decode + energy-delta fp + bands
    "multimodal_video_pairs",    # frame phash + pair-evidence agg
    "stream_contamination",      # stateless bloom filter on a stream
    "bm25_topk",                 # sparse retrieval, quantized scores
    "knn_haversine",             # geodesic distFunc, quantized rank
    "trajectory_stats",          # per-entity ordered-window hops
    "od_matrix",                 # first/last-cell flows per day
    "stay_points",               # gaps-and-islands dwell detection
    # appended round 6
    "stream_contamination_jvm",  # distributed-bloom stream decontamination
    "bm25_multi_topk",           # many-query sparse retrieval, one pass
    "contamination_ngrams",      # 13-gram exact decontamination
    "stream_contamination_ngrams",  # stateless 13-gram ingest filter
    "ann_pq_topk",               # PQ/ADC: 32x-compressed integer scoring
    "boilerplate_ratio",         # window-granular self-dedup signal
    "colocation_pairs",          # rendezvous detection, binned equi-join
    "rrf_fusion_topk",           # BM25 + dense cosine hybrid fusion
    "quality_filter_gopher",     # integer-crossed rule gate, map-only
    "perplexity_buckets",        # LM cost div + per-lang ntile tiers
    "vocab_freq_spectrum",       # cascaded count-of-counts aggregates
    "tfidf_top_terms",           # keyword extraction, broadcast idf
    "pmi_collocations",          # phrase mining, two explode+agg passes
    "distinct_kmv",              # bottom-k sketch, TakeOrdered bottom-k
    "pagerank_handoff",          # integer PageRank, 1 shuffle per round
    "tpch_q3",                   # fact-fact-dim shuffle join benchmark
    "tpch_q18",                  # group-then-join HAVING survivors
    "salted_join_events",        # 16-way salted hot-key equi-join
    "events_outliers",           # median/MAD windows on cents grid
    "jsonl_roundtrip",           # JSONL sink+source, FAILFAST schema
    "orc_roundtrip",             # ORC sink+source, native vectorized
    "events_table_profile",      # one-pass multi-distinct profile
    # round-6 session-3 additions (append-only)
    "funnel_steps",              # one-shuffle array-fold funnel
    "cohort_retention",          # cohort assign + co-partitioned join
    "event_transitions",         # Markov matrix, one window shuffle
    "ohlc_hourly",               # OHLC resample, map-side combinable
    "triangle_count",            # degree-ordered wedge join census
    "fk_orphans",                # 4x anti/semi-join integrity audit
    "fuzzy_name_pairs",          # blocked levenshtein ER self-join
    "tpch_q5",                   # 6-table star join, co-nation conjunct
    "funnel_latency",            # fold + order-stat percentile ranks
    "cusum_alerts",              # closed-form CUSUM, 2 stacked windows
    "rolling_24h",               # RANGE-frame trailing aggregate
    "stream_ohlc",               # streaming replay == batch resample
    "time_weighted_avg",         # lead-window step integral
    "attribution_last_touch",    # ignore-nulls carry-forward window
    "key_skew_report",           # pre-join skew + entropy profile
    "fuzzy_canonical_names",     # ER closure + canonical election
    "stream_outliers",           # batch-fit thresholds scored at ingest
    "date_partitioned_read",     # hive-layout directory pruning
    "merge_upsert",              # latest-wins CDC apply
    "common_neighbors",          # wedge-join link prediction
    "keyness_by_source",         # log-odds distinctive vocabulary
    "seasonal_outliers",         # hour-of-day median/MAD baseline
    # round-6 session-4 additions (append-only)
    "distinct_hll",              # HLL registers, 256-key groupBy
    "bitmap_overlap",            # packed-word audience intersection
    "tpch_q21",                  # semi+anti self-join sandwich
    # round-7 promotions (r6-staged gates, appended at rotation)
    "price_quantiles_hdr",
    "parts_overlap_kmv",
    "scd2_user_state",
    "attribution_linear",
    "zorder_events",
    "user_retention_km",
    "event_sequences_3",
    "lineitem_corr",
    "drift_psi_value",
    "chi2_type_dow",
    "postings_index",
    "order_price_bins",
    "ab_ztest_purchase",
    "hourly_acf",
    "forecast_snaive",
    "rfm_segments",
    "data_expectations",
    "cube_users_hll",
    "scd2_pit_enrich",
    "table_diff_orders",
    "basket_lift_pairs",
    "value_percent_rank",
    "ols_price_qty",
    "cms_user_counts",
    "jaccard_prefix_pairs",
    "bpe_merge_pairs",
    "bfs_reach",
    "stream_cms_counts",
    "sssp_latency",
    "golden_record",
    "latency_cube_hdr",
    "doc_logprob_bigram",
    "pivot_type_dow",
    "min_cost_supplier",
    "cumulative_reach",
    "stream_hll_users",
    "ppr_handoff",
    "schema_evolution_read",
    "funnel_steps_24h",
    "agg_delta_apply",
    "ann_recall_eval",
    # r8-promoted gates (staged in r7)
    "common_neighbors_capped",
    "ann_recall_pq",
    "ann_recall_lsh",
    "sql_st_union",
    "dissolve_zones",
    # r9-promoted gates (staged in r8)
    "sql_st_difference_annulus",
    "ann_recall_lsh_mp",
    "sql_st_buffer_erode",
    "dissolve_adjacent_tiles",
    "sql_st_buffer_erode_split",
    "ann_recall_planted",
    "sql_st_degenerate_contact",
    # r12-promoted gates (staged in r11): planted ANN/semantic family,
    # curation pipelines, graph-metrics trio, exact gini/percentiles,
    # stream contamination riding the stream tier
    "ann_knn_join_planted",
    "dissolve_zones_hier",
    "funnel_latency_fine",
    "price_percentiles_exact",
    "semantic_dedup_planted",
    "semantic_contamination_planted",
    "sample_token_budget",
    "curation_pipeline",
    "curation_pipeline_neardup",
    "passage_dedup_planted",
    "k_core_handoff",
    "graph_assortativity",
    "rich_club_handoff",
    "gini_prices",
    "stream_semantic_contamination",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry
    from stark_spark import get_session

    spark = get_session("bench", master=f"local[{cpus}]",
                        shuffle_partitions=int(cpus))

    # steady-state warmup: JVM JIT, python-worker pool, parquet footers
    from pyspark.sql import functions as _F
    from stark_spark import datasets as D
    from stark_spark.functions.constructors import st_point
    for t in ("events", "lineitem", "customer", "supplier", "part"):
        D.load(spark, sf_dir, t).count()
    (spark.range(1000)
     .select(st_point(_F.col("id").cast("double"),
                      _F.col("id").cast("double")).alias("g")).count())
    from stark_spark.functions.constructors import st_frame
    st_frame(spark.range(256).select(
        _F.concat(_F.lit("POINT ("), _F.col("id").cast("string"),
                  _F.lit(" 1)")).alias("w")), wkt="w").count()
    # applyInPandas + window machinery (python grouped-worker pool,
    # Arrow group serialization, window exec JIT)
    (spark.range(256).groupBy((_F.col("id") % 8).alias("g"))
     .applyInPandas(lambda pdf: pdf, "id long").count())
    from pyspark.sql import Window as _W
    (spark.range(256).withColumn("g", _F.col("id") % 8)
     .withColumn("rn", _F.row_number().over(
         _W.partitionBy("g").orderBy("id")))
     .where(_F.col("rn") <= 2).count())

    # contention canary: a fixed 2000^2 f32 GEMM timed on the driver.
    # Host CPU contention has moved identical bench code by up to 10x
    # across rounds (PARITY.md); the r5 judge's ask: one sample per run
    # can't catch mid-run oscillation, so sample the canary NEXT TO
    # EVERY QUERY — cross-round per-query deltas are discountable
    # exactly when that query's adjacent canary is >2x the quiet-window
    # value (~0.05 s on this host class).
    import numpy as _np
    _a = _np.ones((2000, 2000), dtype=_np.float32)
    _a @ _a  # warm BLAS threadpool

    def _canary() -> float:
        t0 = time.perf_counter()
        _a @ _a
        return round(time.perf_counter() - t0, 4)

    # second canary lens (r11 session-2 lesson): a fixed JVM codegen
    # aggregate. The BLAS canary is memory-bound on an idle
    # threadpool and MISSED a host mode where single-thread JVM
    # codegen degraded ~2x (CPU-steal/frequency noise) while GEMM
    # stayed quiet — funnel-family queries read 2x their history on
    # UNCHANGED code. This lens times exactly what the queries spend:
    # whole-stage-codegen cycles.
    def _jvm_canary() -> float:
        t0 = time.perf_counter()
        spark.range(16_000_000).selectExpr("sum(id * 3 + 7)").first()
        return round(time.perf_counter() - t0, 4)

    _jvm_canary()  # JIT the canary plan itself

    # the pinned list is append-only across rounds, so names retired
    # from the live registry (events_daily, token_counts @ r12) keep
    # benching via their kept functions — cross-round columns stay
    # comparable
    # QUIET MODE (r12 verdict #3 — the storm-dodging retry built INTO
    # the runner, opt-in so the driver's fixed-budget run is
    # untouched): SPARK_GRAFT_QUIET=1 makes every query measurement
    # canary-GATED — spin until both canaries read quiet before the
    # query, re-measure the warm tier when a burst lands inside the
    # brackets, cap attempts per query and put a global deadline on
    # the whole run (past the deadline it degrades to the plain
    # single-shot path, so a storm that outlasts the budget still
    # yields a complete — just honest-canaried — record).
    quiet_mode = os.environ.get("SPARK_GRAFT_QUIET") == "1"
    gemm_bar = float(os.environ.get("SPARK_GRAFT_GEMM_BAR", "0.08"))
    jvm_bar = float(os.environ.get("SPARK_GRAFT_JVM_BAR", "0.12"))
    deadline = time.monotonic() + float(
        os.environ.get("SPARK_GRAFT_QUIET_DEADLINE", "2700"))

    def _quiet_wait(max_spin: float = 90.0) -> tuple[float, float]:
        """Poll until a quiet window (or spin/deadline cap); returns
        the last (gemm, jvm) sample either way."""
        t_end = min(time.monotonic() + max_spin, deadline)
        while True:
            g, j = _canary(), _jvm_canary()
            if (g < gemm_bar and j < jvm_bar) \
                    or time.monotonic() >= t_end:
                return g, j
            time.sleep(2.0)

    qs = dict(entry.retired_queries())
    qs.update(entry.queries())
    times: dict[str, float] = {}
    warm: dict[str, float] = {}
    canaries: dict[str, float] = {}
    jvm_canaries: dict[str, float] = {}
    c_prev = _canary()
    j_prev = _jvm_canary()
    for name in BENCH_QUERIES:
        fn = qs[name]
        if quiet_mode and time.monotonic() < deadline:
            c_prev, j_prev = _quiet_wait()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)
        # second run = steady state (per-query codegen/JIT/python-worker
        # startup amortized — the regime that matters at real scale,
        # where compile time is noise against data time)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        warm[name] = round(time.perf_counter() - t0, 3)
        c_now = _canary()
        j_now = _jvm_canary()
        if quiet_mode:
            # Re-measure the warm tier when the sample is suspect:
            # (a) a burst landed on a bracketing canary, or (b) warm
            # read SLOWER than this very query's cold — steady state
            # can't be slower than first touch, so that's a burst
            # that fit entirely INSIDE the rep and dodged both
            # brackets (the ohlc/dissolve failure mode the r13 A/Bs
            # measured). Keep the best quiet-bracketed sample; cold
            # stays the genuine first touch.
            tries, best_quiet = 0, None
            if c_now < gemm_bar and j_now < jvm_bar:
                best_quiet = warm[name]

            def _suspect(w_q: float) -> bool:
                # slower than cold beyond micro-jitter tolerance
                return w_q > times[name] * 1.15 + 0.05

            while ((best_quiet is None or _suspect(best_quiet))
                   and tries < 3 and time.monotonic() < deadline):
                c_prev, j_prev = _quiet_wait()
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                w = round(time.perf_counter() - t0, 3)
                c_now, j_now = _canary(), _jvm_canary()
                if c_now < gemm_bar and j_now < jvm_bar:
                    best_quiet = (w if best_quiet is None
                                  else min(best_quiet, w))
                warm[name] = min(warm[name], w)
                tries += 1
            if best_quiet is not None:
                warm[name] = best_quiet
        # worst adjacent sample brackets this query's measurement
        canaries[name] = max(c_prev, c_now)
        jvm_canaries[name] = max(j_prev, j_now)
        c_prev, j_prev = c_now, j_now
        print(f"# {name}: {times[name]}s ({n} rows; warm {warm[name]}s; "
              f"canary {canaries[name]}s; jvm {jvm_canaries[name]}s)",
              file=sys.stderr)
    canary = c_prev

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # KEY ORDER MATTERS: the driver archives only a ~2000-char TAIL of
    # stdout, so the big per-query dicts go FIRST and the scalar
    # summary LAST — cross-round totals stay diffable from the
    # truncated artifact alone (r6 verdict ask #2).
    out = {
        "queries": times,
        "queries_warm": warm,
        "canary_per_query": canaries,
        "jvm_canary_per_query": jvm_canaries,
        "canary_jvm_s": j_prev,
        "metric": "headline_queries_total_wall",
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(times),
        "canary_gemm_s": canary,
        "canary_max_s": max(canaries.values()),
        "quiet_mode": quiet_mode,
        "value_warm": round(sum(warm.values()), 3),
        # first-run wall — methodology unchanged across rounds
        "value": round(sum(times.values()), 3),
    }
    print(json.dumps(out))
    # Full untruncated copy, committed per-round: N = newest archived
    # round + 1 (the driver's bench runs before round N's artifacts
    # land, so this stamps the in-flight round both for the driver's
    # end-of-round run and for mid-round local runs).
    try:
        import glob
        import re as _re
        # only the two driver-written artifact families stamp the
        # round — an unrelated *_rN.json must not shift it
        rounds = [int(m.group(1)) for p in
                  glob.glob(os.path.join(os.path.dirname(
                      os.path.abspath(__file__)), "*_r*.json"))
                  if _re.match(r"(BENCH|CORRECTNESS)_r\d+\.json$",
                               os.path.basename(p))
                  and (m := _re.search(r"_r(\d+)\.json$", p))]
        n = max(rounds, default=0) + 1
        # scaling runs (non-default core count) write to a distinct
        # filename so they can never clobber the 32-core record the
        # cross-round compare gate pairs on (r13 verdict #8: the 8-core
        # driver run overwrote BENCH_LOCAL_r14.json and broke CI)
        suffix = "" if cpus == "32" else f"_c{cpus}"
        dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"BENCH_LOCAL_r{n:02d}{suffix}.json")
        with open(dst, "w") as f:
            json.dump(out, f, indent=1)
        print(f"# full results -> {dst}", file=sys.stderr)
    except OSError as exc:  # read-only checkout: stdout still has it
        print(f"# BENCH_LOCAL write skipped: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

"""Deterministic sampling / splitting / shard-packing tests
(operators/sampling.py) — verified against exact pandas
recomputations of the hash arithmetic and the packing invariants.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from stark_spark import datasets as D
from stark_spark.operators.sampling import (BUCKETS, deterministic_sample,
                                            group_quantiles, pack_shards,
                                            stratified_sample,
                                            train_test_split)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return D.load(spark, sf_dir, "documents").cache()


def _bucket(key, salt=""):
    return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:7], 16)


def test_deterministic_sample_matches_python_hash(docs):
    got = {r.doc_id for r in
           deterministic_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    all_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    want = {k for k in all_ids if _bucket(k) < int(0.3 * BUCKETS)}
    assert got == want
    assert 0 < len(got) < len(all_ids)


def test_sample_fractions_nest(docs):
    """Thresholded hash membership is monotone: sample(0.2) is a
    subset of sample(0.4) — the property that makes incremental
    corpus growth consistent."""
    small = {r.doc_id for r in
             deterministic_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    big = {r.doc_id for r in
           deterministic_sample(docs, "doc_id", 0.4).select("doc_id").collect()}
    assert small <= big


def test_train_test_split_partitions_and_reproduces(docs):
    out = train_test_split(docs, "doc_id", 0.25).select("doc_id", "split")
    rows = {r.doc_id: r.split for r in out.collect()}
    assert set(rows) == {r.doc_id for r in docs.select("doc_id").collect()}
    again = {r.doc_id: r.split for r in
             train_test_split(docs, "doc_id", 0.25)
             .select("doc_id", "split").collect()}
    assert rows == again
    n_test = sum(1 for s in rows.values() if s == "test")
    assert 0.15 < n_test / len(rows) < 0.35


def test_stratified_sample_respects_per_stratum_thresholds(docs):
    out = stratified_sample(docs, "doc_id", "lang",
                            {"en": 0.1, "zh": 0.9}, default=0.5)
    got = {(r.doc_id, r.lang) for r in out.select("doc_id", "lang").collect()}
    frac = {"en": 0.1, "zh": 0.9}
    for r in docs.select("doc_id", "lang").collect():
        keep = _bucket(r.doc_id) < int(frac.get(r.lang, 0.5) * BUCKETS)
        assert ((r.doc_id, r.lang) in got) == keep


def test_pack_shards_matches_sequential_packing(docs):
    cap = 20000
    docs_w = docs.withColumn("w", F.size(F.split(F.col("text"), " "))
                                   .cast("long"))
    out = pack_shards(docs_w, "doc_id", "w", cap)
    got = {r.doc_id: r.shard for r in out.select("doc_id", "shard").collect()}

    rows = sorted(
        ((_bucket(k, "shard"), k, w) for k, w in
         ((r.doc_id, r.w) for r in docs_w.select("doc_id", "w").collect())))
    cum, want = 0, {}
    for _, k, w in rows:
        want[k] = cum // cap
        cum += w
    assert got == want
    # every shard except the last spans >= capacity worth of weight
    shard_tot = {}
    for _, k, w in rows:
        shard_tot[want[k]] = shard_tot.get(want[k], 0) + w
    last = max(shard_tot)
    assert set(shard_tot) == set(range(last + 1))
    max_w = max(w for _, _, w in rows)
    for s, tot in shard_tot.items():
        if s != last:
            assert tot >= cap - max_w


def test_group_quantiles_match_sorted_pick(docs):
    qs = [0.25, 0.5, 0.9]
    out = group_quantiles(docs, "lang", "n_chars", qs)
    got = {(r.lang, r.q): r.value for r in out.collect()}
    # plan lock (r10, loosened r11): ONE sorted pass serves every
    # requested q. Pinned on the OPTIMIZED LOGICAL plan (stable
    # across Spark versions / AQE replans, per advisor): no per-q
    # Union, and the Window-node count is a constant (rank + count
    # share the lang partitioning), not proportional to len(qs).
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan
    assert plan.count("Window [") <= 2
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "lang#" in line  # every window partitioned by group
    by_lang = {}
    for r in docs.select("lang", "n_chars").collect():
        by_lang.setdefault(r.lang, []).append(r.n_chars)
    for lang, vals in by_lang.items():
        vals.sort()
        for q in qs:
            pick = max(math.ceil(q * len(vals)), 1)
            assert got[(lang, q)] == vals[pick - 1], (lang, q)


def test_top_k_per_group(docs):
    from stark_spark.operators.sampling import top_k_per_group
    counts = (docs.groupBy("lang", "source")
                  .agg(F.count("*").alias("n")))
    got = top_k_per_group(counts, "lang", "n", 2,
                          tie_cols=["source"]).toPandas()
    pdf = counts.toPandas()
    for lang, grp in pdf.groupby("lang"):
        want = list(grp.sort_values(["n", "source"],
                                    ascending=[False, True]).source[:2])
        g = got[got.lang == lang].sort_values("rank")
        assert list(g.source) == want and list(g["rank"]) == [1, 2]


def test_mix_sources_hits_targets(docs):
    """Mixture reweighting: kept counts per source approximate the
    integer targets k_s = floor(N*w_s/W) (hash thresholds are rate
    approximations — within a few rows at fixture size), membership is
    a pure function of (key, salt), unlisted sources are dropped."""
    from stark_spark.operators.sampling import mix_sources
    weights = {"src0": 3, "src1": 2, "src2": 1, "src3": 1}
    out = mix_sources(docs, "doc_id", "source", weights)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= set(weights)
    counts = {r["source"]: r["n"] for r in
              docs.where(F.col("source").isin(*weights))
                  .groupBy("source").agg(F.count("*").alias("n")).collect()}
    W = sum(weights.values())
    n_out = min(counts[s] * W // w for s, w in weights.items())
    for s, w in weights.items():
        k = n_out * w // W
        assert abs(got.get(s, 0) - k) <= max(3, k // 4), (s, got.get(s), k)
    rerun = mix_sources(docs, "doc_id", "source", weights)
    assert {r.doc_id for r in rerun.select("doc_id").collect()} == \
           {r.doc_id for r in out.select("doc_id").collect()}


def test_weighted_sample(spark):
    """A-ES weighted sampling: deterministic under a fixed salt,
    inclusion frequency tracks weight across salts, and the plan is a
    TakeOrderedAndProject (no full sort shuffle)."""
    from stark_spark.operators.sampling import weighted_sample
    rows = [(i, 9.0 if i < 50 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")

    out1 = weighted_sample(df, "id", "w", 40, salt="s1")
    assert [r.id for r in out1.collect()] == \
        [r.id for r in weighted_sample(df, "id", "w", 40,
                                       salt="s1").collect()]

    heavy = 0
    for s in range(12):
        sel = {r.id for r in
               weighted_sample(df, "id", "w", 40,
                               salt=f"t{s}").collect()}
        assert len(sel) == 40
        heavy += len([i for i in sel if i < 50])
    # 50 heavy keys at weight 9 vs 150 light at 1: heavy expected
    # inclusion ≫ light's. Loose floor: > 55% of selections heavy.
    assert heavy > 0.55 * 12 * 40

    plan = weighted_sample(df, "id", "w", 40)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_by_group(spark):
    """Per-group A-ES: exactly k per group (or all if smaller), and
    within a group the selection equals the global sampler restricted
    to that group (same keys, same salt)."""
    from stark_spark.operators.sampling import (weighted_sample,
                                                weighted_sample_by_group)
    rows = [(i, "g%d" % (i % 3), float(1 + i % 7)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    out = weighted_sample_by_group(df, "id", "grp", "w", 10)
    pdf = out.toPandas()
    assert pdf.groupby("grp").size().to_dict() == \
        {"g0": 10, "g1": 10, "g2": 10}
    for g in ("g0", "g1", "g2"):
        solo = weighted_sample(df.where(F.col("grp") == g), "id", "w",
                               10)
        assert set(pdf[pdf.grp == g].id) == \
            {r.id for r in solo.collect()}


def test_group_split_no_leakage(spark, docs):
    """Every group lands wholly on one side; fractions are roughly
    honored at the GROUP level; deterministic across calls."""
    from stark_spark.operators.sampling import group_split
    out = group_split(docs, "source", 0.3)
    sides = (out.groupBy("source")
                .agg(F.countDistinct("split").alias("k")).collect())
    assert all(r.k == 1 for r in sides)
    again = group_split(docs, "source", 0.3)
    assert (out.select("doc_id", "split").exceptAll(
        again.select("doc_id", "split")).count() == 0)
    n_test_groups = (out.where(F.col("split") == "test")
                        .select("source").distinct().count())
    n_groups = out.select("source").distinct().count()
    assert 0 <= n_test_groups < n_groups


def test_temperature_weights_and_mix(spark):
    """alpha=0.5 damps head domains: a 10000:100:1 corpus gets parts
    proportional to sqrt — small sources are upweighted relative to
    natural share; alpha=1 keeps proportions, alpha=0 is uniform; the
    parts drive mix_sources end-to-end."""
    from stark_spark.operators.sampling import (mix_sources,
                                                temperature_weights)
    counts = {"web": 10000, "wiki": 100, "code": 1}
    w5 = temperature_weights(counts, 0.5)
    # sqrt: 100 : 10 : 1 → scaled by 1000/100
    assert w5 == {"web": 1000, "wiki": 100, "code": 10}
    w1 = temperature_weights(counts, 1.0)
    assert w1["web"] == 1000 and w1["wiki"] == 10 and w1["code"] == 1
    w0 = temperature_weights(counts, 0.0)
    assert set(w0.values()) == {1000}
    # sqrt damping lifts wiki's part ratio vs web from the natural
    # 100/10000 = 1% to 100/1000 = 10%
    assert w5["wiki"] / w5["web"] > counts["wiki"] / counts["web"]
    # zero-count sources are excluded, never given a token part
    assert temperature_weights({"web": 100, "empty": 0}) == \
        {"web": 1000}
    assert temperature_weights({"empty": 0}) == {}

    # end-to-end: parts feed mix_sources and keep per-source rows
    # proportional to the parts (within hash-threshold granularity)
    rows = [(i, "a" if i < 900 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    parts = temperature_weights({"a": 900, "b": 100}, 0.5)
    out = mix_sources(df, "doc_id", "source", parts)
    got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    # parts a:b = 1000:333 → achievable corpus limited by b; per-source
    # keeps follow the integer-threshold formula of mix_sources
    assert got["a"] > got["b"] > 0
    assert got["a"] / got["b"] < 900 / 100   # damped vs natural ratio

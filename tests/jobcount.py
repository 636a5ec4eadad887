import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry
from stark_spark import get_session
from pyspark.sql import functions as F
from stark_spark import datasets as D

sf = "/root/testdata/sf0.1"
spark = get_session("jobs", master="local[32]", shuffle_partitions=32)
sc = spark.sparkContext
for t in ("events", "lineitem", "customer", "supplier", "part"):
    D.load(spark, sf, t).count()
spark.range(256).groupBy((F.col("id") % 8).alias("g")).applyInPandas(lambda p: p, "id long").count()

qs = dict(entry.retired_queries()); qs.update(entry.queries())
import bench
names = sys.argv[1:] or bench.BENCH_QUERIES

tracker = sc.statusTracker()
out = {}
for n in names:
    fn = qs[n]
    fn(spark, sf).count()          # warm once
    before = max(tracker.getJobIdsForGroup() or [0])
    t0 = time.perf_counter()
    fn(spark, sf).count()
    wall = round(time.perf_counter() - t0, 3)
    after = max(tracker.getJobIdsForGroup() or [0])
    njobs = after - before
    nstages = 0; ntasks = 0
    for j in range(before + 1, after + 1):
        ji = tracker.getJobInfo(j)
        if ji is None: continue
        for s in ji.stageIds:
            si = tracker.getStageInfo(s)
            if si and si.numCompletedTasks > 0:
                nstages += 1; ntasks += si.numTasks
    out[n] = (njobs, nstages, ntasks, wall)
    print(f"{n:34s} jobs={njobs:3d} stages={nstages:3d} tasks={ntasks:5d} wall={wall}")
with open("/tmp/jobcount.json", "w") as f:  # scratch summary
    json.dump(out, f)
spark.stop()

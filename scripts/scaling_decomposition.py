"""Scaling-efficiency decomposition: run the flagship conversion at
$DIAG_CORES threads with the Spark UI enabled, then pull per-stage
executorRunTime over the REST API to report total CPU-seconds and
executor utilization (cpu / (wall x cores)).

Decomposition identity: raw strong-scaling efficiency
  = (C_N / C_4N) x (U_4N / U_N)
where C = total CPU-seconds and U = utilization. If U stays ~1 at both
levels, the entire efficiency loss is per-core CPU inflation (shared
clock / memory bandwidth / host contention), not the engine.
"""
import os, sys, time, json, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import os
builder = (SparkSession.builder.appName("diag").master(f"local[{os.environ.get('DIAG_CORES','32')}]")
    .config("spark.sql.shuffle.partitions", str(2*int(os.environ.get("DIAG_CORES","32"))))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", os.environ.get("DIAG_CORES","32"))
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "true"))
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from osm2streets_spark.sources.fixtures import ensure_fixtures
from osm2streets_spark.plans.pipeline import flagship_query
fix = ensure_fixtures("sf_scale_4x")
flagship_query(spark, ensure_fixtures("sf0.001")).count()
spark.catalog.clearCache()
t0=time.time()
n = flagship_query(spark, fix).count()
wall=time.time()-t0
print(f"wall={wall:.1f}", flush=True)
app = spark.sparkContext.applicationId
data = json.load(urllib.request.urlopen(f"http://localhost:4040/api/v1/applications/{app}/stages?status=complete"))
rows=[]
for s in data:
    if s.get("submissionTime") is None: continue
    dur = s["executorRunTime"]
    rows.append((s["firstTaskLaunchedTime"], s["completionTime"], s["stageId"], s["numCompleteTasks"], dur/1000.0, s["name"][:50]))
# wall-clock per stage via completion-submission
import datetime
def ts(x): return datetime.datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f")
out=[]
for f,c,sid,nt,cpu,name in rows:
    w=(ts(c)-ts(f)).total_seconds()
    out.append((w,sid,nt,cpu,name))
out.sort(reverse=True)
total_cpu = sum(cpu for _,_,_,cpu,_ in out)
import os as _os
if _os.environ.get("DIAG_STAGES"):
    for w,sid,nt,cpu,name in out[:14]:
        print(f"  stage {sid:4d} wall={w:6.1f}s cpu={cpu:7.1f}s tasks={nt:3d} {name}")
print(f"CORES={os.environ.get('DIAG_CORES','32')} wall={wall:.1f} total_cpu={total_cpu:.1f} utilization={total_cpu/(wall*int(os.environ.get('DIAG_CORES','32'))):.3f}")

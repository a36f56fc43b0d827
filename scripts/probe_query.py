"""Ad-hoc single-query timing probe: cold + 3 steady passes at a given
sf dir. Usage: python scripts/probe_query.py <query> [sf_dir] [passes]"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from sparkflow_spark.queries import load_all, clear_result_memo

name = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.driver.memory", "28g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()
q = reg[name]
ts = []
for i in range(passes + 1):
    t0 = time.time()
    n = q.fn(spark, sf).count()
    dt = time.time() - t0
    ts.append(dt)
    print(f"pass {i}{' (cold)' if i == 0 else ''}: {dt:.3f}s rows={n}", flush=True)
st = sorted(ts[1:])
print(f"steady median: {st[len(st)//2]:.3f}s")

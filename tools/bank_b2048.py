import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["SVT_BENCH_PRESET"] = "small"
os.environ["SVT_BENCH_BATCH"] = "2048"
os.environ["SVT_BENCH_INNER"] = "1"
import bench
t0 = time.time()
bench.inner()
print(f"b2048 banked in {time.time()-t0:.0f}s", flush=True)

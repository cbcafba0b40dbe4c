import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["SVT_BENCH_PRESET"] = "full"
os.environ["SVT_BENCH_BATCH"] = "1024"
os.environ["SVT_BENCH_INNER"] = "1"
import bench
t0 = time.time()
bench.inner()
print(f"full1024 banked in {time.time()-t0:.0f}s", flush=True)

import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
t0 = time.time()
import __graft_entry__
fn, (pa,) = __graft_entry__.entry()
ok = np.asarray(fn(pa))
print(f"entry banked in {time.time()-t0:.0f}s ok={ok.all()}", flush=True)
t0 = time.time()
os.environ["SVT_BENCH_PRESET"] = "small"
import bench
bench.main()
print(f"bench banked in {time.time()-t0:.0f}s", flush=True)

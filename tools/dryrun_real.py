import os, sys, time
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")
import __graft_entry__
t0 = time.time()
__graft_entry__.dryrun_multichip(8)
print(f"dryrun completed in {time.time()-t0:.0f}s", flush=True)

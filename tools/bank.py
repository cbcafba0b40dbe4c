"""Parameterized bench/dryrun launcher (replaces the nine bank_*.py shims).

Usage:
  python tools/bank.py PRESET [BATCH]     # bench preset: small/mid/full/zk20
  python tools/bank.py entry              # __graft_entry__.entry on device
  python tools/bank.py dryrun [N]         # dryrun_multichip over N cpu devs

Runs the inner bench (no subprocess wrapper) so a detached launch warms the
AOT executable cache (`fixtures/exec_*.jex`) for the driver's bench run.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "small"
    t0 = time.time()
    if what == "entry":
        import numpy as np

        import __graft_entry__

        fn, (pa,) = __graft_entry__.entry()
        ok = np.asarray(fn(pa))
        print(f"entry banked in {time.time()-t0:.0f}s ok={ok.all()}",
              flush=True)
        return
    if what == "dryrun":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={n}")
        os.environ["XLA_FLAGS"] = " ".join(flags)
        import jax

        jax.config.update("jax_platforms", "cpu")
        import __graft_entry__

        __graft_entry__.dryrun_multichip(n)
        print(f"dryrun banked in {time.time()-t0:.0f}s", flush=True)
        return
    os.environ["SVT_BENCH_PRESET"] = what
    if len(sys.argv) > 2:
        os.environ["SVT_BENCH_BATCH"] = sys.argv[2]
    os.environ["SVT_BENCH_INNER"] = "1"
    import bench

    bench.inner()
    print(f"{what}{os.environ.get('SVT_BENCH_BATCH', '')} banked in "
          f"{time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()

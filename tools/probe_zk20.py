"""Probe the real zk Semaphore workload: 2^20-member access set, zk on,
natural circuit degree (no min_degree padding). Prints degree + s/proof."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.semaphore.access_set import AccessSet, semaphore_config

rng = np.random.default_rng(0)
n = 1 << 20
t0 = time.time()
sks = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
pks = AccessSet.public_key(sks)
print(f"pks in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
aset = AccessSet(pks, semaphore_config())
print(f"tree in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
data = aset.circuit()
print(f"circuit: degree 2^{data.common.degree_bits}, "
      f"lde_bits {data.common.fri_params.lde_bits}, "
      f"arities {data.common.fri_params.reduction_arity_bits}, "
      f"gates {[g.id.split('(')[0] for g in data.common.gates]}, "
      f"built in {time.time()-t0:.1f}s", flush=True)
B = 4
idx = rng.integers(0, n, size=B)
topics = rng.integers(0, gl.P, size=(B, 4), dtype=np.uint64)
t0 = time.time()
signals = aset.make_signals(sks[idx], topics, idx)
dt = time.time() - t0
print(f"proved {B} in {dt:.1f}s ({dt/B:.2f}s/proof)", flush=True)
t0 = time.time()
ok = aset.verify_signals_np(signals[:1])
print(f"golden verify: {ok} in {time.time()-t0:.1f}s", flush=True)

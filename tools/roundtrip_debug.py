"""Dev driver: build a tiny hash-preimage circuit, prove, verify (numpy)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.prover.builder import CircuitBuilder
from stark_verifier_tpu.prover.prove import prove_batch
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import gl64_np as gl

t0 = time.time()
cfg = CircuitConfig(fri_config=FriConfig(rate_bits=3, cap_height=2,
                                         proof_of_work_bits=10, num_query_rounds=12))
b = CircuitBuilder(cfg)
sk = b.add_virtual_targets(8)
h = b.hash_n_to_hash_no_pad(sk)
b.register_public_inputs(h)
data = b.build()
print("built: degree", data.common.degree, "gates", data.common.gate_ids,
      "selectors", data.common.selectors_info, f"{time.time()-t0:.2f}s")

B = 3
rng = np.random.default_rng(1)
inputs = {t: rng.integers(0, gl.P, size=B, dtype=np.uint64) for t in sk}
t0 = time.time()
proofs = prove_batch(data, inputs, B)
print(f"proved {B} in {time.time()-t0:.2f}s")

t0 = time.time()
for i, p in enumerate(proofs):
    ok = verify_proof(gl, data.common, data.vk, p)
    print(f"proof {i}: accept={bool(ok)}  ({time.time()-t0:.2f}s)")
    assert ok, f"proof {i} rejected!"

# negative test: corrupt an opening
p = proofs[0]
p.openings.wires[0, 0] ^= np.uint64(1)
assert not verify_proof(gl, data.common, data.vk, p), "corrupt proof accepted!"
print("corrupt proof rejected — OK")

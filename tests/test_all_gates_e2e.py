"""Kitchen-sink circuit: every gate type in the reference registry appears
in one proved-and-verified circuit (poseidon, arithmetic (base+ext), mul
ext, base sum, random access, reducing, constant, public input, noop)."""
import numpy as np

from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import ext2
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.prover.builder import CircuitBuilder
from stark_verifier_tpu.prover.prove import prove_batch

rng = np.random.default_rng(8)


def test_kitchen_sink_circuit():
    cfg = CircuitConfig(fri_config=FriConfig(rate_bits=3, cap_height=1,
                                             proof_of_work_bits=6,
                                             num_query_rounds=6))
    b = CircuitBuilder(cfg)
    xs = b.add_virtual_targets(8)
    small = b.add_virtual_target()  # input constrained < 2^20 by BaseSumGate
    h = b.hash_n_to_hash_no_pad(xs)                      # PoseidonGate
    prod = b.mul(h[0], h[1])                             # ArithmeticGate
    s = b.add(prod, h[2])
    bits = b.split_le(small, 20)                         # BaseSumGate(20)
    items = [b.mul(h[i % 4], h[(i + 1) % 4]) for i in range(4)]
    two = b.constant(2)                                  # ConstantGate
    idx_bits = bits[:2]
    idx = b.arithmetic(2, 1, idx_bits[1], b.one(), idx_bits[0])  # 2*b1 + b0
    picked = b.random_access(idx, items)                 # RandomAccessGate(2,...)
    ext_a = [h[0], h[1]]
    ext_b = [h[2], h[3]]
    m = b.mul_extension(3, ext_a, ext_b)                 # MulExtensionGate
    ae = b.arithmetic_extension(5, 7, m, ext_b, ext_a)   # ArithmeticExtensionGate
    red = b.reduce_with_powers_ext(ae, m, [s, prod, picked, two])  # ReducingGate
    b.register_public_inputs(h)
    b.register_public_inputs(red)
    data = b.build()
    gate_names = {g.split(" ")[0].split("(")[0] for g in data.common.gate_ids}
    assert {"PoseidonGate", "ArithmeticGate", "BaseSumGate", "ConstantGate",
            "RandomAccessGate", "MulExtensionGate", "ArithmeticExtensionGate",
            "ReducingGate", "PublicInputGate", "NoopGate"} <= gate_names, gate_names

    B = 2
    inputs = {t: rng.integers(0, gl.P, size=B, dtype=np.uint64) for t in xs}
    inputs[small] = rng.integers(0, 1 << 20, size=B, dtype=np.uint64)
    proofs = prove_batch(data, inputs, B)
    for p in proofs:
        assert verify_proof(gl, data.common, data.vk, p)

    # cross-check the reducing output against host math for proof 0
    pis = proofs[0].public_inputs
    h_v = pis[:4]
    prod_v = gl.mul(h_v[0], h_v[1])
    s_v = gl.add(prod_v, h_v[2])
    idx_v = int(inputs[small][0]) & 3
    items_v = [gl.mul(h_v[i % 4], h_v[(i + 1) % 4]) for i in range(4)]
    m_v = ext2.scalar_mul(gl, ext2.mul(gl, (h_v[0], h_v[1]), (h_v[2], h_v[3])),
                          gl.const(3))
    ae_v = ext2.add(gl, ext2.scalar_mul(gl, ext2.mul(gl, m_v, (h_v[2], h_v[3])),
                                        gl.const(5)),
                    ext2.scalar_mul(gl, (h_v[0], h_v[1]), gl.const(7)))
    acc = m_v
    for c in (s_v, prod_v, items_v[idx_v], np.uint64(2)):
        acc = ext2.add(gl, ext2.mul(gl, acc, ae_v), (np.uint64(c), np.uint64(0)))
    assert pis[4] == acc[0] and pis[5] == acc[1]

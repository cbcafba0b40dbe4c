"""The flagship pipeline: batched Semaphore-proof verification on TPU.

Builds (or loads from the fixture cache) a Semaphore access set, proves a
batch of signals with the host prover, and exposes the jittable batched
verifier over GF-typed proof arrays — the unit that bench.py measures and
__graft_entry__ compile-checks.
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..core import verifier as V
from ..core.types import CircuitConfig, FriConfig, load_proofs, save_proofs
from ..ops import gl64_jax as gj
from ..ops import gl64_np as gl
from ..semaphore.access_set import AccessSet

FIXTURE_DIR = Path(__file__).resolve().parent.parent.parent / "fixtures"


def small_config() -> CircuitConfig:
    """Compile-friendly preset for smoke paths (entry/dryrun)."""
    return CircuitConfig(
        fri_config=FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=8,
                             num_query_rounds=4)
    )


def bench_config() -> CircuitConfig:
    """The headline Semaphore FRI parameters (reference:
    plonky2_semaphore/access_set.rs:68-84): blowup 8, 28 queries, 16 PoW
    bits, cap height 4."""
    return CircuitConfig(
        fri_config=FriConfig(rate_bits=3, cap_height=4, proof_of_work_bits=16,
                             num_query_rounds=28)
    )


def build_semaphore_batch(n_members_bits=8, batch=8, config=None,
                          min_degree=0, cache_tag=None, seed=0):
    """Returns (proofs, common, vk): a batch of semaphore proofs for one
    access set, cached as an .npz fixture."""
    if cache_tag:
        path = FIXTURE_DIR / f"sem_{cache_tag}.npz"
        if path.exists():
            return load_proofs(path)
    rng = np.random.default_rng(seed)
    n = 1 << n_members_bits
    sks = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
    # big member sets: cache the hashed keys + Merkle tree (2^20 keys cost
    # ~25 min to hash+tree on host)
    tree_cache = (FIXTURE_DIR / f"aset_tree_{n_members_bits}_{seed}.npz"
                  if n_members_bits >= 16 else None)
    if tree_cache is not None and tree_cache.exists():
        from ..core.merkle import MerkleTree

        aset = AccessSet.__new__(AccessSet)
        aset.tree = MerkleTree.load(tree_cache)
        aset.tree_height = n_members_bits
        aset.config = config or small_config()
        aset.min_degree = min_degree
        aset._circuit = None
    else:
        pks = AccessSet.public_key(sks)
        aset = AccessSet(pks, config or small_config(), min_degree=min_degree)
        if tree_cache is not None:
            FIXTURE_DIR.mkdir(exist_ok=True)
            aset.tree.save(tree_cache)
    idx = rng.integers(0, n, size=batch)
    topics = rng.integers(0, gl.P, size=(batch, 4), dtype=np.uint64)
    signals = aset.make_signals(sks[idx], topics, idx)
    proofs = [s.proof for s in signals]
    data = aset.circuit()
    if cache_tag:
        FIXTURE_DIR.mkdir(exist_ok=True)
        save_proofs(FIXTURE_DIR / f"sem_{cache_tag}.npz", proofs, data.common, data.vk)
    return proofs, data.common, data.vk


def dryrun_config() -> CircuitConfig:
    """Minimal config for the multichip dryrun: 2 FRI queries, cap 0, and —
    the big one — 8 wires instead of the reference preset's 135/80
    (`pi_hash_in_circuit=False` keeps PoseidonGate out of the gate set, so
    no 118-constraint vanishing term and no 135 wire openings).

    The dryrun validates mesh sharding + collectives on XLA:CPU, where both
    compile time (superlinear) and execution time (per-op dispatch on tiny
    tensors) scale with graph size: the 135-wire dryrun graph compiled in
    2.4 h and did not finish executing in 1.8 h on an 8-device virtual
    mesh (4 cores), while the protocol being validated — sharded verify,
    psum, digest chain — is wire-count-independent."""
    return CircuitConfig(
        num_wires=8, num_routed_wires=8,
        fri_config=FriConfig(rate_bits=3, cap_height=0, proof_of_work_bits=4,
                             num_query_rounds=2),
        pi_hash_in_circuit=False,
    )


def build_dryrun_batch(batch=16, cache_tag="dryrun3w8"):
    """A tiny arithmetic circuit (ArithmeticGate/ConstantGate/PublicInput/
    Noop — no PoseidonGate) proved for `batch` lanes: the multichip-dryrun
    workload. Exercises the identical sharded verify + psum + digest-chain
    program structure as the flagship at a fraction of the XLA:CPU compile
    cost."""
    from ..prover.builder import CircuitBuilder
    from ..prover.prove import prove_batch

    if cache_tag:
        path = FIXTURE_DIR / f"sem_{cache_tag}.npz"
        if path.exists():
            proofs, common, vk = load_proofs(path)
            if len(proofs) >= batch:
                return proofs[:batch], common, vk
    b = CircuitBuilder(dryrun_config())
    xs = b.add_virtual_targets(4)
    acc = b.mul(xs[0], xs[1])
    acc = b.arithmetic(3, 5, acc, xs[2], xs[3])
    b.register_public_inputs(xs)
    b.register_public_input(acc)
    data = b.build()
    rng = np.random.default_rng(7)
    inputs = {t: rng.integers(0, gl.P, size=batch, dtype=np.uint64) for t in xs}
    proofs = prove_batch(data, inputs, batch)
    if cache_tag:
        FIXTURE_DIR.mkdir(exist_ok=True)
        save_proofs(FIXTURE_DIR / f"sem_{cache_tag}.npz", proofs,
                    data.common, data.vk)
    return proofs, data.common, data.vk


def batched_arrays(proofs):
    """Stack per-proof arrays along a leading batch axis (u64 numpy)."""
    pas = [V.proof_to_arrays(p) for p in proofs]
    return {k: np.stack([pa[k] for pa in pas]) for k in pas[0]}


def make_verifier_fn(common, vk):
    """Returns (jittable_fn, to_gf) where jittable_fn maps the GF-typed
    batched arrays -> accept bool [B]."""
    import jax

    vk_cap = gj.from_u64(vk.constants_sigmas_cap)
    digest = gj.from_u64(vk.circuit_digest)

    def verify_one(pa):
        return V.verify(gj, common, vk_cap, digest, pa)

    fn = jax.jit(jax.vmap(verify_one))

    def to_gf(batched):
        return {k: gj.from_u64(v) for k, v in batched.items()}

    return fn, to_gf


def make_verifier_fn_phased(common, vk):
    """Three-phase verifier (challenges / vanishing / FRI), each its own
    jit(vmap) — caps per-compile graph size (~3x smaller each), for
    compile-latency-bound environments (XLA:CPU dryruns, cold chips).
    Returns (fn, to_gf); fn runs the three compiled programs in sequence."""
    import jax

    vk_cap = gj.from_u64(vk.constants_sigmas_cap)
    digest = gj.from_u64(vk.circuit_digest)

    f1 = jax.jit(jax.vmap(lambda pa: V.phase_challenges(gj, common, digest, pa)))
    f2 = jax.jit(jax.vmap(
        lambda pa, pi, ch: V.phase_vanishing(gj, common, pa, pi, ch)))
    f3 = jax.jit(jax.vmap(
        lambda pa, ch, ok: V.phase_fri(gj, common, vk_cap, pa, ch, ok)))

    def fn(pa_gf):
        pi_hash, ch = f1(pa_gf)
        ok = f2(pa_gf, pi_hash, ch)
        return f3(pa_gf, ch, ok)

    def to_gf(batched):
        return {k: gj.from_u64(v) for k, v in batched.items()}

    return fn, to_gf


def make_verifier_fn_batched(common, vk):
    """Batch-in-lanes verifier: the proof batch rides as the leading axis of
    every element array (core/verifier_batched.py), keeping VPU lanes full
    and letting the Pallas Poseidon kernel (SVT_PALLAS=1) see B*Q-wide
    batches in the transcript/Merkle stages."""
    import jax

    from ..core import verifier_batched as VB

    vk_cap = gj.from_u64(vk.constants_sigmas_cap)
    digest = gj.from_u64(vk.circuit_digest)

    fn = jax.jit(lambda pa: VB.verify_batched(gj, common, vk_cap, digest, pa))

    def to_gf(batched):
        return {k: gj.from_u64(v) for k, v in batched.items()}

    return fn, to_gf


# ----------------------------------------------------- AOT executable cache
def save_compiled(compiled, path):
    """Serialize a compiled (AOT) verifier executable to disk: reloading
    skips both tracing and XLA compilation (the axon backend does not hit
    jax's persistent HLO cache, so this is the fast-start path)."""
    import pickle

    from jax.experimental.serialize_executable import serialize

    payload, in_tree, out_tree = serialize(compiled)
    Path(path).parent.mkdir(exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump((payload, in_tree, out_tree), f)


def load_compiled(path):
    import pickle

    from jax.experimental.serialize_executable import deserialize_and_load

    with open(path, "rb") as f:
        payload, in_tree, out_tree = pickle.load(f)
    return deserialize_and_load(payload, in_tree, out_tree)


def compiled_verifier(common, vk, pa_gf, cache_path=None, mode="vmap"):
    """AOT-compile (or load) the batched verifier for these array shapes."""
    if mode == "batched":
        fn, _ = make_verifier_fn_batched(common, vk)
    elif mode == "phased":
        # already three separate jits; no single AOT executable to cache
        fn, _ = make_verifier_fn_phased(common, vk)
        return fn
    else:
        fn, _ = make_verifier_fn(common, vk)
    if cache_path and Path(cache_path).exists():
        try:
            return load_compiled(cache_path)
        except Exception as e:  # stale/foreign artifact: recompile
            print(f"# exec cache load failed ({e}); recompiling", flush=True)
    comp = fn.lower(pa_gf).compile()
    if cache_path:
        try:
            save_compiled(comp, cache_path)
        except Exception as e:
            print(f"# exec cache save failed ({e})", flush=True)
    return comp

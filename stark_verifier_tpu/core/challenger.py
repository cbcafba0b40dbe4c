"""Fiat–Shamir Challenger: width-12 rate-8 overwrite-mode duplex sponge over
Goldilocks Poseidon, replicating plonky2 `Challenger` semantics exactly.

Key semantics (reference: chip/hasher_chip.rs:49-120):
  * observing clears the output buffer and lazily buffers inputs;
  * squeezing first absorbs any buffered inputs in chunks of 8 (overwrite the
    front of the state, permute per chunk);
  * challenges are popped from the END of the rate window (state[7], then
    state[6], ...), refilling with a permutation when empty.

Backend-generic: the element arrays may carry a batch dimension, so one
Challenger instance replays the transcript for a whole batch of proofs. All
buffer bookkeeping is static python (fixed by the proof shape), so the JAX
trace is branch-free.
"""
from __future__ import annotations

from ..ops import poseidon_gl as pg

WIDTH = pg.WIDTH
RATE = pg.RATE


class Challenger:
    def __init__(self, F, shape=(), permute=None):
        """`permute` selects the hash config (None = Goldilocks Poseidon;
        pass ops/hashers.get_permute("bn254", F) for the
        Bn254PoseidonGoldilocksConfig transcript; reference:
        plonky2_config.rs:70-75)."""
        self.F = F
        self.shape = shape
        self.permute_fn = permute or pg.permute
        self.state = [F.zeros(shape) for _ in range(WIDTH)]
        self.input_buffer = []
        self.output_buffer = []

    # -------------------------------------------------------------- observe
    def observe_element(self, e):
        self.output_buffer = []
        self.input_buffer.append(e)
        if len(self.input_buffer) == RATE:
            self._duplexing()

    def observe_elements(self, elems):
        elems = list(elems)
        # JAX fast path: absorb runs of full rate-8 chunks with one lax.scan
        if getattr(self.F, "IS_JAX", False) and len(elems) >= 24:
            # align: fill the current partial buffer first
            while self.input_buffer and elems:
                self.observe_element(elems.pop(0))
            n_full = len(elems) // RATE
            if n_full >= 2:
                self.output_buffer = []
                chunks = [elems[i * RATE : (i + 1) * RATE] for i in range(n_full)]
                self.state = pg.absorb_chunks_scan(
                    self.F, self.state, chunks, permute=self.permute_fn)
                self.output_buffer = list(self.state[:RATE])
                elems = elems[n_full * RATE :]
        for e in elems:
            self.observe_element(e)

    def observe_extension(self, ext):
        self.observe_element(ext[0])
        self.observe_element(ext[1])

    def observe_hash(self, h4):
        self.observe_elements(h4)

    def observe_cap(self, cap):
        """cap: list of 4-element digests."""
        self.observe_elements([e for h in cap for e in h])

    # -------------------------------------------------------------- squeeze
    def _permute(self):
        self.state = self.F.unstack(self.permute_fn(self.F, self.F.stack(self.state)))

    def _duplexing(self):
        assert len(self.input_buffer) <= RATE
        for i, e in enumerate(self.input_buffer):
            self.state[i] = e
        self.input_buffer = []
        self._permute()
        self.output_buffer = list(self.state[:RATE])

    def get_challenge(self):
        if self.input_buffer:
            self._duplexing()
        if not self.output_buffer:
            self._permute()
            self.output_buffer = list(self.state[:RATE])
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int):
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        c = self.get_n_challenges(2)
        return (c[0], c[1])


# --------------------------------------------------------------- tape replay
class _ChalHandle:
    """Deferred challenge: index into TapeChallenger.finalize()'s value list."""

    __slots__ = ("i",)

    def __init__(self, i):
        self.i = i


class TapeChallenger:
    """Same API and byte-exact semantics as Challenger, but RECORDS the
    duplex schedule instead of executing it; finalize() then runs every
    permutation of the transcript as ONE lax.scan over the static absorb
    tape (per-step overwrite masks) and returns the squeezed values.

    Sound for transcript REPLAY (verification): every absorbed element is
    proof/vk data known up front — a squeezed challenge is never absorbed
    back — so the whole tape exists before any permutation runs. The win is
    compile time: a transcript has ~25 sequential duplex steps, and each
    inlined permutation body (18k jaxpr eqns for the bn254 bridge, or a
    Pallas call + planes for Goldilocks) otherwise repeats per step.

    get_challenge() returns an opaque _ChalHandle; resolve_challenges()
    swaps handles for arrays after finalize(). Do NOT use for a prover-side
    transcript that absorbs values derived from earlier squeezes."""

    def __init__(self, F, shape=(), permute=None):
        self.F = F
        self.shape = tuple(shape)
        self.permute_fn = permute or pg.permute
        self.input_buffer = []
        self.steps = []       # list of absorb lists (len <= RATE)
        self.n_out = 0        # unread outputs left from the last permutation
        self.squeezes = []    # (step index, state position)

    # observe_* mirror Challenger exactly (recording instead of hashing)
    def observe_element(self, e):
        self.n_out = 0
        self.input_buffer.append(e)
        if len(self.input_buffer) == RATE:
            self.steps.append(self.input_buffer)
            self.input_buffer = []
            self.n_out = RATE

    def observe_elements(self, elems):
        for e in elems:
            self.observe_element(e)

    def observe_extension(self, ext):
        self.observe_element(ext[0])
        self.observe_element(ext[1])

    def observe_hash(self, h4):
        self.observe_elements(h4)

    def observe_cap(self, cap):
        self.observe_elements([e for h in cap for e in h])

    def get_challenge(self):
        if self.input_buffer:
            self.steps.append(self.input_buffer)
            self.input_buffer = []
            self.n_out = RATE
        elif self.n_out == 0:
            self.steps.append([])
            self.n_out = RATE
        self.n_out -= 1
        h = _ChalHandle(len(self.squeezes))
        self.squeezes.append((len(self.steps) - 1, self.n_out))
        return h

    def get_n_challenges(self, n: int):
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        c = self.get_n_challenges(2)
        return (c[0], c[1])

    def finalize(self):
        """Run the recorded tape; returns vals with vals[handle.i] = GF."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        F = self.F
        assert not self.input_buffer, "unabsorbed inputs at finalize"
        # union shape over every absorbed element (vmap traces pass logical
        # scalars; batched lanes pass [B]; constants may be plain scalars)
        shape = jnp.broadcast_shapes(
            self.shape,
            *[tuple(e.l0.shape) for chunk in self.steps for e in chunk])
        k = len(self.steps)
        if k == 0:
            return []
        mask = np.zeros((k, RATE), bool)
        z = F.zeros(shape)
        flat = []
        for ci, chunk in enumerate(self.steps):
            mask[ci, : len(chunk)] = True
            flat.extend(F.add(e, z) for e in chunk)
            flat.extend(F.zeros(shape) for _ in range(RATE - len(chunk)))
        xs = F.reshape(F.stack(flat), (k, RATE) + shape)
        m = jnp.asarray(mask).reshape((k, RATE) + (1,) * len(shape))
        permute = self.permute_fn

        def body(st, x):
            chunk, mm = x
            front = F.select(mm, chunk, F.index(st, slice(0, RATE)))
            st = permute(F, F.concat(
                [front, F.index(st, slice(RATE, None))], axis=0))
            return st, st

        st0 = F.stack([F.zeros(shape) for _ in range(WIDTH)])
        _, states = jax.lax.scan(body, st0, (xs, m))  # GF [k, WIDTH, ...]
        return [F.index(states, (si, pos)) for si, pos in self.squeezes]


def resolve_challenges(obj, vals):
    """Recursively swap _ChalHandle leaves for their finalized arrays."""
    if isinstance(obj, _ChalHandle):
        return vals[obj.i]
    if isinstance(obj, list):
        return [resolve_challenges(x, vals) for x in obj]
    if isinstance(obj, tuple):
        return tuple(resolve_challenges(x, vals) for x in obj)
    return obj

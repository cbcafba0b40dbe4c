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

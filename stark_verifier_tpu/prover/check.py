"""Witness constraint checker — the MockProver analogue (reference:
halo2's MockProver as used throughout the reference's tests; SURVEY §4.2).

Evaluates every gate's constraints on the actual witness rows plus the copy
constraints, reporting violations with row/gate/constraint coordinates.
Pure host-side numpy; used by tests and circuit debugging.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..core.rings import BaseRing
from ..ops import gl64_np as gl
from ..ops import poseidon_gl as pg
from .builder import CircuitData


def check_witness(data: CircuitData, W: np.ndarray, pis: np.ndarray,
                  batch_index: int = 0) -> List[str]:
    """W: [num_wires, n, B]; returns a list of violation descriptions."""
    out = []
    common = data.common
    R = BaseRing(gl)
    pi_hash = pg.hash_no_pad(gl, [pis[i, batch_index] for i in range(pis.shape[0])])
    n_sel = common.selectors_info.num_selectors
    gate_index = {g.id: i for i, g in enumerate(common.gates)}

    for row, (gate, consts) in enumerate(data.builder.gate_rows):
        gi = gate_index[gate.id]
        creg = list(consts) + [0] * 8
        wires = [W[c, row, batch_index] for c in range(common.config.num_wires)]
        cs = gate.eval_unfiltered(
            R, [np.uint64(c % gl.P) for c in creg], wires, pi_hash)
        for j, c in enumerate(cs):
            if c != 0:
                out.append(f"row {row} gate {gate.id} constraint {j} != 0")

    # copy constraints (transitive classes)
    parent = {}

    def find(t):
        while parent.get(t, t) != t:
            parent[t] = parent.get(parent[t], parent[t])
            t = parent[t]
        return t

    for a, b in data.builder.copy_constraints:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    classes = {}
    for a, b in data.builder.copy_constraints:
        for t in (a, b):
            if t[0] == "w":
                classes.setdefault(find(t), []).append(t)
    for root, members in classes.items():
        vals = {int(W[t[2], t[1], batch_index]) for t in members}
        if len(vals) > 1:
            out.append(f"copy class {root}: differing values over {members[:4]}...")
    return out

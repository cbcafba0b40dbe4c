"""Signal-batch aggregation: the native replacement for the reference's
recursive proof-aggregation tree (reference: plonky2_semaphore/
recursion.rs:187-247, README tree diagram).

The reference folds N proofs into one by recursively *re-proving* pairwise
verifications (~5.8 s/pair). Here the batch is verified directly (TPU,
parallel/batch_verify.py) and the aggregate artifact is a Poseidon digest
tree over (public inputs, accept bit) leaves — the same binary-tree shape,
computed in microseconds, committing to exactly which signals of the batch
were valid under which root/topics.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..core.merkle import MerkleTree
from ..ops import gl64_np as gl
from ..ops import poseidon_gl as pg
from .access_set import AccessSet, Signal


def aggregate_signals_np(aset: AccessSet, signals: List[Signal]) -> dict:
    """Host-side aggregation: verify each signal and build the digest tree.

    Returns {"accept": [N] bool, "digest": [4] u64, "count": int}.
    """
    oks = aset.verify_signals_np(signals)
    return {
        "accept": oks,
        "digest": aggregation_digest(aset, signals, oks),
        "count": int(sum(oks)),
    }


def aggregation_digest(aset: AccessSet, signals: List[Signal], oks) -> np.ndarray:
    """Binary Poseidon tree over leaf = H(public_inputs ‖ accept)."""
    n = 1
    while n < len(signals):
        n *= 2
    leaves = np.zeros((n, 13), dtype=np.uint64)
    for i, (s, ok) in enumerate(zip(signals, oks)):
        leaves[i, :12] = aset.expected_public_inputs(s)
        leaves[i, 12] = np.uint64(1 if ok else 0)
    tree = MerkleTree(leaves, cap_height=0)
    return tree.cap[0]

"""Poseidon-Goldilocks Merkle tree over committed-polynomial matrices.

Mirrors the reference `MerkleTreeGL`
(src/starkpil/merkleTree/merkleTreeGL.{hpp,cpp}): leaves are rows of `width`
felts hashed with the rate-8 sponge, internal nodes are
Poseidon([left4|right4|0^4])[:4], node storage is level-by-level bottom-up
with the root last, and query proofs walk sibling digests up the tree
(merkleTreeGL.cpp:24-35).

The build is a device computation (`poseidon_gl.merkelize`); proof
extraction is host-side indexing over the fetched node array.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import numpy as np

from ..ops import goldilocks as gl
from ..ops import poseidon_gl
from ..ops.goldilocks import GL

HASH_SIZE = 4


class MerkleTreeGL:
    """source: GL (height, width). nodes: (2*height - 1, 4) after merkelize."""

    def __init__(self, source: GL):
        self.source = source
        self.height, self.width = source.shape
        self.nodes: GL = None
        self._nodes_host = None

    def merkelize(self) -> None:
        nodes = poseidon_gl.merkelize_cached(self.source)
        # The (2N-1, 4) node array is only ever read on the HOST (root
        # absorption + query sibling paths), but on device its 4-lane
        # minor dim pads to 128 — a 32x inflation (~1 GB per production
        # tree, ~10 GB across the proof's 9 trees).  Fetch once, free the
        # device copy immediately.
        self._nodes_host = gl.to_u64(nodes)
        self.nodes = None

    def root(self) -> List[int]:
        assert self._nodes_host is not None
        return [int(v) for v in self._nodes_host[-1]]

    # ---- host-side query proofs (small; operate on fetched numpy) ----

    def _nodes_np(self) -> np.ndarray:
        return self._nodes_host

    def get_group_proof(self, idx: int) -> Tuple[np.ndarray, List[List[int]]]:
        """Returns (row values (width,), sibling path [[4 felts], ...])."""
        row = gl.to_u64(self.source[idx])
        nodes = self._nodes_np()
        siblings = []
        offset = 0
        n = self.height
        i = idx
        while n > 1:
            sib = i ^ 1
            siblings.append([int(v) for v in nodes[offset + sib]])
            offset += n
            n //= 2
            i >>= 1
        return row, siblings

    @staticmethod
    def verify_proof(root: List[int], idx: int, row_values, siblings) -> bool:
        leaf = poseidon_gl.linear_hash_host([int(v) for v in row_values])
        h = leaf
        i = idx
        for sib in siblings:
            if i & 1:
                h = poseidon_gl.permute_host(list(sib) + list(h) + [0, 0, 0, 0])[:4]
            else:
                h = poseidon_gl.permute_host(list(h) + list(sib) + [0, 0, 0, 0])[:4]
            i >>= 1
        return h == list(root)

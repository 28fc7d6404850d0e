"""Arity-16 Merkle tree + transcript over BN254 (recursiveF stage).

Reference: src/starkpil/merkleTree/merkleTreeBN128.{hpp,cpp} (BN128_ARITY
16, starkRecursiveF.hpp:22) and transcript/transcriptBN128.cpp.  Leaves
hash rows of Goldilocks felts packed 3-per-Fr element; nodes hash 16
children; the root is a single Fr element cheap to verify inside a BN254
circuit.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

from ..ops import poseidon_bn254
from ..ops.bn254_field import R_MOD
from ..ops.goldilocks import P as GL_P

ARITY = 16


def pack_row(felts: List[int]) -> List[int]:
    """Pack Goldilocks felts 3-per-Fr (reference linearHash BN128 packing)."""
    out = []
    for off in range(0, len(felts), 3):
        chunk = felts[off:off + 3]
        v = 0
        for i, c in enumerate(chunk):
            v |= int(c) << (64 * i)
        out.append(v % R_MOD)
    return out


def leaf_hash(felts: List[int]) -> int:
    """Reference leaf semantics (merkleTreeBN128.cpp:88-152): rows of
    width <= 4 are stored as ONE packed Fr element (4 felts per limb, no
    hash); wider rows are packed 3-per-Fr and sponge-hashed with the
    final partial chunk at t = pending+1."""
    if len(felts) <= 4:
        v = 0
        for i, c in enumerate(felts):
            v |= int(c) << (64 * i)
        return v % R_MOD
    return poseidon_bn254.linear_hash(pack_row(felts))


class MerkleTreeBN128:
    def __init__(self, rows: List[List[int]]):
        """rows: height x width Goldilocks felt rows."""
        self.height = len(rows)
        self.width = len(rows[0]) if rows else 0
        self.leaves = [leaf_hash(r) for r in rows]
        self.levels: List[List[int]] = [self.leaves]
        cur = self.leaves
        while len(cur) > 1:
            nxt = []
            for i in range(0, len(cur), ARITY):
                nxt.append(poseidon_bn128_node(cur[i:i + ARITY]))
            self.levels.append(nxt)
            cur = nxt
        self.rows = rows

    def root(self) -> int:
        return self.levels[-1][0] if self.leaves else 0

    def get_group_proof(self, idx: int) -> Tuple[List[int], List[List[int]]]:
        """(row values, FULL 16-child groups per level — own child included;
        the verifier checks group[pos] equals the recomputed digest).  Full
        groups keep the in-circuit verifier free of dynamic insertion."""
        row = list(self.rows[idx])
        siblings = []
        i = idx
        for level in self.levels[:-1]:
            base = (i // ARITY) * ARITY
            group = [
                level[j] if j < len(level) else 0
                for j in range(base, base + ARITY)
            ]
            siblings.append(group)
            i //= ARITY
        return row, siblings

    @staticmethod
    def verify_proof(root: int, idx: int, row: List[int],
                     siblings: List[List[int]]) -> bool:
        h = leaf_hash(row)
        i = idx
        for group in siblings:
            pos = i % ARITY
            if group[pos] != h:
                return False
            h = poseidon_bn128_node(list(group))
            i //= ARITY
        return h == root


def poseidon_bn128_node(children: List[int]) -> int:
    return poseidon_bn254.hash16(children)


class TranscriptBN128:
    """Fiat-Shamir over Fr (reference transcriptBN128.cpp): 16-slot
    pending buffer, single-element state, 3 Goldilocks challenges per Fr
    squeeze."""

    PENDING = 16

    def __init__(self):
        self.state = 0
        self.pending: List[int] = []
        self.out: List[int] = []

    def put(self, values) -> None:
        for v in values:
            self._add1(int(v) % R_MOD)

    def _add1(self, v: int) -> None:
        self.pending.append(v)
        self.out = []
        if len(self.pending) == self.PENDING:
            self._squeeze()

    def _squeeze(self) -> None:
        st = [self.state] + self.pending + \
            [0] * (self.PENDING - len(self.pending))
        outs = poseidon_bn254.permute(st)
        self.state = outs[0]
        self.pending = []
        self.out = list(outs)

    def get_field_fr(self) -> int:
        if not self.out:
            self._squeeze()
        return self.out.pop(0)

    def get_fields_gl(self, n: int = 3) -> List[int]:
        """n Goldilocks challenges: split a squeezed Fr into 64-bit chunks
        reduced mod the Goldilocks prime."""
        fr = self.get_field_fr()
        return [((fr >> (64 * i)) & ((1 << 64) - 1)) % GL_P
                for i in range(n)]

    def get_permutations(self, n: int, n_bits: int) -> List[int]:
        """n query indices of n_bits each, drawn LSB-first from ceil(n *
        n_bits / 253)-many 253-bit squeezes; an index may SPAN two fields
        (reference transcriptBN128.cpp:95-131 getPermutations)."""
        total = n * n_bits
        n_fields = (total - 1) // 253 + 1
        fields = [self.get_field_fr() for _ in range(n_fields)]
        out = []
        cur, bit = 0, 0
        for _ in range(n):
            a = 0
            for j in range(n_bits):
                if (fields[cur] >> bit) & 1:
                    a += 1 << j
                bit += 1
                if bit == 253:
                    bit = 0
                    cur += 1
            out.append(a)
        return out

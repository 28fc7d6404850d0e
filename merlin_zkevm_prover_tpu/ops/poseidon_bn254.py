"""Poseidon over BN254 Fr, t = 17 (reference src/poseidon_opt/).

The circomlib optimized evaluation form (reference poseidon_opt.cpp:9-63):
initial ark, half the full rounds with the MDS M (last pre-partial mix
uses P), sparse-matrix partial rounds with per-round S vectors, then the
remaining full rounds.  Host python-int implementation — used by the
arity-16 BN128 Merkle tree and transcript of the recursiveF stage, whose
volumes are tiny next to the Goldilocks pipeline.
"""

from __future__ import annotations

from typing import List, Sequence

from .bn254_field import R_MOD as FR_MOD
from .poseidon_bn254_constants import C, M, N_ROUNDS_F, N_ROUNDS_P, P, S, T


def _exp5(x: int) -> int:
    x2 = x * x % FR_MOD
    x4 = x2 * x2 % FR_MOD
    return x4 * x % FR_MOD


def _mix(state: List[int], mat) -> List[int]:
    return [
        sum(mat[j][i] * state[j] for j in range(T)) % FR_MOD
        for i in range(T)
    ]


def permute(state: Sequence[int]) -> List[int]:
    """The t=17 permutation on [capacity, in0..in15]."""
    assert len(state) == T
    st = [s % FR_MOD for s in state]
    # initial ark
    st = [(st[i] + C[i]) % FR_MOD for i in range(T)]
    half_f = N_ROUNDS_F // 2
    for r in range(half_f - 1):
        st = [_exp5(x) for x in st]
        st = [(st[i] + C[(r + 1) * T + i]) % FR_MOD for i in range(T)]
        st = _mix(st, M)
    st = [_exp5(x) for x in st]
    st = [(st[i] + C[half_f * T + i]) % FR_MOD for i in range(T)]
    st = _mix(st, P)
    for r in range(N_ROUNDS_P):
        st[0] = _exp5(st[0])
        st[0] = (st[0] + C[(half_f + 1) * T + r]) % FR_MOD
        s0 = 0
        base = (T * 2 - 1) * r
        new = list(st)
        for j in range(T):
            s0 = (s0 + S[base + j] * st[j]) % FR_MOD
            if j > 0:
                new[j] = (st[j] + st[0] * S[base + T + j - 1]) % FR_MOD
        new[0] = s0
        st = new
    for r in range(half_f - 1):
        st = [_exp5(x) for x in st]
        st = [
            (st[i] + C[(half_f + 1) * T + N_ROUNDS_P + r * T + i]) % FR_MOD
            for i in range(T)
        ]
        st = _mix(st, M)
    st = [_exp5(x) for x in st]
    return _mix(st, M)


def hash16(inputs: Sequence[int], capacity: int = 0) -> int:
    """Arity-16 node hash: state = [capacity | 16 inputs] -> state[0]."""
    vals = list(inputs)
    assert len(vals) <= 16
    vals = vals + [0] * (16 - len(vals))
    return permute([capacity % FR_MOD] + [v % FR_MOD for v in vals])[0]


def linear_hash(values: Sequence[int]) -> int:
    """Sponge over arbitrary-length input in 16-element chunks, chaining
    the previous output through the capacity slot."""
    acc = 0
    vals = list(values)
    if not vals:
        return hash16([])
    for off in range(0, len(vals), 16):
        acc = hash16(vals[off:off + 16], capacity=acc)
    return acc

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


# ---------------------------------------------------------------------------
# Variable-width permutation (t = 2..17) — reference Poseidon_opt::hash
# dispatches on the state size (poseidon_opt.cpp:9-63), and the BN128
# Merkle linear hash feeds the FINAL partial chunk as a t = pending+1
# state instead of zero-padding to 17 (merkleTreeBN128.cpp:117-136).
# Constant tables for every t live in poseidon_bn254_all_t.npz
# (circomlib data, transcoded by tools/gen_poseidon_bn254_all_t.py; the
# t=17 slice is asserted equal to the inline tables above at load).
# ---------------------------------------------------------------------------

import functools
import os

import numpy as np


@functools.lru_cache(maxsize=1)
def _all_t_tables():
    path = os.path.join(os.path.dirname(__file__),
                        "poseidon_bn254_all_t.npz")
    raw = np.load(path)

    def ints(key):
        a = raw[key]
        return [int.from_bytes(a[i].tobytes(), "big")
                for i in range(a.shape[0])]

    tables = {}
    for t in range(2, 18):
        c = ints(f"C_{t}")
        s = ints(f"S_{t}")
        m_flat = ints(f"M_{t}")
        p_flat = ints(f"P_{t}")
        m = [m_flat[i * t:(i + 1) * t] for i in range(t)]
        p = [p_flat[i * t:(i + 1) * t] for i in range(t)]
        n_rounds_p = len(s) // (2 * t - 1)
        tables[t] = (c, s, m, p, n_rounds_p)
    assert tables[17][0] == list(C) and tables[17][4] == N_ROUNDS_P
    return tables


def permute_t(state: Sequence[int]) -> List[int]:
    """Poseidon permutation for any state width 2..17 (optimized circomlib
    evaluation form, same schedule as permute() above)."""
    t = len(state)
    if t == T:
        return permute(state)
    c, s, m, p, n_rounds_p = _all_t_tables()[t]

    def mix(st, mat):
        return [sum(mat[j][i] * st[j] for j in range(t)) % FR_MOD
                for i in range(t)]

    st = [(x % FR_MOD + c[i]) % FR_MOD for i, x in enumerate(state)]
    half_f = N_ROUNDS_F // 2
    for r in range(half_f - 1):
        st = [_exp5(x) for x in st]
        st = [(st[i] + c[(r + 1) * t + i]) % FR_MOD for i in range(t)]
        st = mix(st, m)
    st = [_exp5(x) for x in st]
    st = [(st[i] + c[half_f * t + i]) % FR_MOD for i in range(t)]
    st = mix(st, p)
    for r in range(n_rounds_p):
        st[0] = _exp5(st[0])
        st[0] = (st[0] + c[(half_f + 1) * t + r]) % FR_MOD
        s0 = 0
        base = (t * 2 - 1) * r
        new = list(st)
        for j in range(t):
            s0 = (s0 + s[base + j] * st[j]) % FR_MOD
            if j > 0:
                new[j] = (st[j] + st[0] * s[base + t + j - 1]) % FR_MOD
        new[0] = s0
        st = new
    for r in range(half_f - 1):
        st = [_exp5(x) for x in st]
        st = [(st[i] + c[(half_f + 1) * t + n_rounds_p + r * t + i])
              % FR_MOD for i in range(t)]
        st = mix(st, m)
    st = [_exp5(x) for x in st]
    return mix(st, m)


def hash_t(inputs: Sequence[int], capacity: int = 0) -> int:
    """state = [capacity | inputs] at t = len(inputs)+1 -> state[0]."""
    return permute_t([capacity % FR_MOD]
                     + [v % FR_MOD for v in inputs])[0]


def linear_hash(values: Sequence[int]) -> int:
    """Sponge over Fr elements in 16-wide chunks with capacity chaining;
    the final partial chunk runs at t = pending+1 — bit-compatible with
    reference MerkleTreeBN128::linearHash (merkleTreeBN128.cpp:88-141)."""
    acc = 0
    vals = list(values)
    if not vals:
        return hash16([])
    off = 0
    while off < len(vals):
        chunk = vals[off:off + 16]
        if len(chunk) == 16:
            acc = hash16(chunk, capacity=acc)
        else:
            acc = hash_t(chunk, capacity=acc)
        off += 16
    return acc

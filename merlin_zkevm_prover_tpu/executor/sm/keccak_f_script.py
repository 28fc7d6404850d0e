"""Keccak-f[1600] as a gate script (reference tools/sm/keccak_f/:
theta/rho/pi/chi/iota gate builders -> the KeccakF SM's "script" JSON).

chi's (~a & b) maps directly onto the ANDP gate; iota XORs the round
constant via the constant-one wire.  The resulting program has the same
gate-count scale as the reference slot (155,286 gate rows per keccak-f,
keccak_config.hpp:21-28).
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np

from .gate import GateProgram

_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


@functools.lru_cache(maxsize=1)
def build_keccak_f_program() -> GateProgram:
    """1600 input wires (bit z of lane (x,y) at 64*(x+5y)+z) -> 1600 out."""
    prog = GateProgram()
    zero = prog.new_wire()   # wire 0 == 0
    one = prog.new_wire()    # wire 1 == 1
    state = [[ [prog.new_wire() for _ in range(64)] for _ in range(5)]
             for _ in range(5)]
    prog.inputs = [state[x][y][z]
                   for y in range(5) for x in range(5) for z in range(64)]

    for rc in _ROUND_CONSTANTS:
        # theta
        c = [[prog.xor_many([state[x][y][z] for y in range(5)])
              for z in range(64)] for x in range(5)]
        d = [[prog.xor(c[(x - 1) % 5][z], c[(x + 1) % 5][(z - 1) % 64])
              for z in range(64)] for x in range(5)]
        state = [[[prog.xor(state[x][y][z], d[x][z]) for z in range(64)]
                  for y in range(5)] for x in range(5)]
        # rho + pi
        b = [[[None] * 64 for _ in range(5)] for _ in range(5)]
        for x in range(5):
            for y in range(5):
                for z in range(64):
                    b[y][(2 * x + 3 * y) % 5][z] = \
                        state[x][y][(z - _ROT[x][y]) % 64]
        # chi: a[x] = b[x] ^ ((~b[x+1]) & b[x+2])
        new_state = [[[None] * 64 for _ in range(5)] for _ in range(5)]
        for x in range(5):
            for y in range(5):
                for z in range(64):
                    t = prog.andp(b[(x + 1) % 5][y][z], b[(x + 2) % 5][y][z])
                    new_state[x][y][z] = prog.xor(b[x][y][z], t)
        state = new_state
        # iota
        for z in range(64):
            if (rc >> z) & 1:
                state[0][0][z] = prog.xor(state[0][0][z], one)

    prog.outputs = [state[x][y][z]
                    for y in range(5) for x in range(5) for z in range(64)]
    return prog


def state_to_bits(words: List[int]) -> np.ndarray:
    """25 uint64 lanes -> (1600, 1) bit column."""
    out = np.zeros((1600, 1), dtype=np.uint8)
    for i, w in enumerate(words):
        for z in range(64):
            out[64 * i + z, 0] = (w >> z) & 1
    return out


def bits_to_state(bits: np.ndarray) -> List[int]:
    return [
        sum(int(bits[64 * i + z, 0]) << z for z in range(64))
        for i in range(25)
    ]

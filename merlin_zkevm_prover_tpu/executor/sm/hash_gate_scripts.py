"""SHA-256 and Blake2b-256 gate-script generators.

The reference ships offline gate-circuit builders for three hash
families under tools/sm/ (keccak_f/, sha256/, blake/): each expresses
the compression function as XOR/ANDP gates over a wire array (via a
GateU32/GateU64 word abstraction with ripple-carry adders,
reference tools/sm/sha256/sha256_gate.cpp + gate_u32, tools/sm/blake/
blake_gate.cpp), evaluated by the gate framework (src/sm/gate/).  This
module is the framework's equivalent on executor/sm/gate.GateProgram:
word-level circuits compiled to the same two gate ops, bit-exact
against the Python hashlib oracles (tests/test_hash_gates.py) — the
reference validates the same way against its byte-level SHA256/Blake
implementations (tools/sm/sha256/sha256_test.cpp, blake/blake_test.cpp).

Word representation: little-endian bit lists of wire ids.  Composite
ops on the two primitive gates (out = a ^ b, out = ~a & b):
  AND(a,b)  = ANDP(XOR(a,one), b)
  NOT(a)    = XOR(a, one)
  MAJ/CH    via the standard XOR/AND decompositions
  ADD       ripple-carry from XOR/AND/OR gates
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np

from .gate import GateProgram, evaluate


class GateWord:
    """A w-bit word as little-endian wire-id list + helpers."""

    def __init__(self, prog: GateProgram, bits: List[int]):
        self.prog = prog
        self.bits = bits

    @property
    def w(self):
        return len(self.bits)


class WordOps:
    def __init__(self, prog: GateProgram, one: int, zero: int):
        self.prog = prog
        self.one = one
        self.zero = zero

    def const_word(self, value: int, w: int) -> GateWord:
        return GateWord(self.prog, [
            self.one if (value >> i) & 1 else self.zero for i in range(w)
        ])

    def _not(self, a: int) -> int:
        return self.prog.xor(a, self.one)

    def _and(self, a: int, b: int) -> int:
        return self.prog.andp(self._not(a), b)

    def _or(self, a: int, b: int) -> int:
        # a | b = ~(~a & ~b)
        return self._not(self.prog.andp(a, self._not(b)))

    def xor(self, *words: GateWord) -> GateWord:
        out = words[0].bits
        for wd in words[1:]:
            out = [self.prog.xor(x, y) for x, y in zip(out, wd.bits)]
        return GateWord(self.prog, out)

    def and_(self, a: GateWord, b: GateWord) -> GateWord:
        return GateWord(self.prog,
                        [self._and(x, y) for x, y in zip(a.bits, b.bits)])

    def not_(self, a: GateWord) -> GateWord:
        return GateWord(self.prog, [self._not(x) for x in a.bits])

    def andp(self, a: GateWord, b: GateWord) -> GateWord:
        """~a & b per bit (one native gate)."""
        return GateWord(self.prog,
                        [self.prog.andp(x, y) for x, y in zip(a.bits, b.bits)])

    def rotr(self, a: GateWord, r: int) -> GateWord:
        w = a.w
        return GateWord(self.prog, [a.bits[(i + r) % w] for i in range(w)])

    def shr(self, a: GateWord, r: int) -> GateWord:
        w = a.w
        return GateWord(self.prog, [
            a.bits[i + r] if i + r < w else self.zero for i in range(w)
        ])

    def add(self, a: GateWord, b: GateWord) -> GateWord:
        """Ripple-carry modular add (reference GateU32::operator+ shape)."""
        p = self.prog
        out = []
        carry = None
        for x, y in zip(a.bits, b.bits):
            if carry is None:
                out.append(p.xor(x, y))
                carry = self._and(x, y)
            else:
                xy = p.xor(x, y)
                out.append(p.xor(xy, carry))
                # carry' = (x & y) | (carry & (x ^ y))
                carry = self._or(self._and(x, y), self._and(carry, xy))
        return GateWord(p, out)

    def add_many(self, words: Sequence[GateWord]) -> GateWord:
        acc = words[0]
        for wd in words[1:]:
            acc = self.add(acc, wd)
        return acc


# ---------------------------------------------------------------------------
# SHA-256 (reference tools/sm/sha256/sha256_gate.cpp flow)
# ---------------------------------------------------------------------------

_SHA256_K = [
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
]

_SHA256_H0 = [0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
              0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19]


@functools.lru_cache(maxsize=1)
def build_sha256_compress_program() -> GateProgram:
    """Inputs: 256 state bits (8 x u32 LE-bit) + 512 chunk bits (16 x u32
    big-endian word order, LE bits per word); outputs the updated 256-bit
    state.  One slot of the reference's SHA256 gate circuit
    (tools/sm/sha256/sha256_gate.cpp chunk loop)."""
    prog = GateProgram()
    zero = prog.new_wire()
    one = prog.new_wire()
    ops = WordOps(prog, one, zero)

    hw = [GateWord(prog, [prog.new_wire() for _ in range(32)])
          for _ in range(8)]
    msg = [GateWord(prog, [prog.new_wire() for _ in range(32)])
           for _ in range(16)]
    prog.inputs = [b for wd in hw for b in wd.bits] + \
        [b for wd in msg for b in wd.bits]

    w = list(msg)
    for i in range(16, 64):
        s0 = ops.xor(ops.rotr(w[i - 15], 7), ops.rotr(w[i - 15], 18),
                     ops.shr(w[i - 15], 3))
        s1 = ops.xor(ops.rotr(w[i - 2], 17), ops.rotr(w[i - 2], 19),
                     ops.shr(w[i - 2], 10))
        w.append(ops.add_many([w[i - 16], s0, w[i - 7], s1]))

    a, b, c, d, e, f, g, h = hw
    for i in range(64):
        s1 = ops.xor(ops.rotr(e, 6), ops.rotr(e, 11), ops.rotr(e, 25))
        ch = ops.xor(ops.and_(e, f), ops.andp(e, g))   # (e&f) ^ (~e&g)
        t1 = ops.add_many([h, s1, ch, ops.const_word(_SHA256_K[i], 32), w[i]])
        s0 = ops.xor(ops.rotr(a, 2), ops.rotr(a, 13), ops.rotr(a, 22))
        maj = ops.xor(ops.and_(a, b), ops.and_(a, c), ops.and_(b, c))
        t2 = ops.add(s0, maj)
        h, g, f, e, d, c, b, a = g, f, e, ops.add(d, t1), c, b, a, \
            ops.add(t1, t2)

    outs = []
    for h0, v in zip(hw, (a, b, c, d, e, f, g, h)):
        outs.append(ops.add(h0, v))
    prog.outputs = [bit for wd in outs for bit in wd.bits]
    return prog


def _u32_bits_le(v: int) -> List[int]:
    return [(v >> i) & 1 for i in range(32)]


def sha256_gate(data: bytes) -> bytes:
    """SHA-256 via the gate program (behavioral oracle for the script).

    Padding per tools/sm/sha256/sha256_gate.cpp:36-56."""
    prog = build_sha256_compress_program()
    bitlen = len(data) * 8
    padded = data + b"\x80" + b"\x00" * ((55 - len(data)) % 64) + \
        bitlen.to_bytes(8, "big")
    h = list(_SHA256_H0)
    for off in range(0, len(padded), 64):
        chunk = padded[off:off + 64]
        words = [int.from_bytes(chunk[i * 4:i * 4 + 4], "big")
                 for i in range(16)]
        in_bits = []
        for v in h:
            in_bits.extend(_u32_bits_le(v))
        for v in words:
            in_bits.extend(_u32_bits_le(v))
        out = evaluate(prog, np.array(in_bits, dtype=np.uint8)[:, None])
        out = out[:, 0]
        h = [sum(int(out[i * 32 + k]) << k for k in range(32))
             for i in range(8)]
    return b"".join(v.to_bytes(4, "big") for v in h)


# ---------------------------------------------------------------------------
# Blake2b-256 (reference tools/sm/blake/blake_gate.cpp flow; 64-bit words)
# ---------------------------------------------------------------------------

_BLAKE2B_IV = [
    0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b,
    0xa54ff53a5f1d36f1, 0x510e527fade682d1, 0x9b05688c2b3e6c1f,
    0x1f83d9abfb41bd6b, 0x5be0cd19137e2179,
]

_BLAKE2B_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
]


@functools.lru_cache(maxsize=1)
def build_blake2b_compress_program() -> GateProgram:
    """One Blake2b compression: inputs = 8x64 state bits + 16x64 message
    bits + 2x64 offset counters + 64 final-flag bits; outputs 8x64."""
    prog = GateProgram()
    zero = prog.new_wire()
    one = prog.new_wire()
    ops = WordOps(prog, one, zero)

    hw = [GateWord(prog, [prog.new_wire() for _ in range(64)])
          for _ in range(8)]
    m = [GateWord(prog, [prog.new_wire() for _ in range(64)])
         for _ in range(16)]
    t0 = GateWord(prog, [prog.new_wire() for _ in range(64)])
    t1 = GateWord(prog, [prog.new_wire() for _ in range(64)])
    fflag = GateWord(prog, [prog.new_wire() for _ in range(64)])
    prog.inputs = [b for wd in hw for b in wd.bits] + \
        [b for wd in m for b in wd.bits] + t0.bits + t1.bits + fflag.bits

    v = list(hw) + [ops.const_word(iv, 64) for iv in _BLAKE2B_IV]
    v[12] = ops.xor(v[12], t0)
    v[13] = ops.xor(v[13], t1)
    v[14] = ops.xor(v[14], fflag)

    def G(a, b, c, d, x, y):
        va = ops.add_many([v[a], v[b], x])
        vd = ops.rotr(ops.xor(v[d], va), 32)
        vc = ops.add(v[c], vd)
        vb = ops.rotr(ops.xor(v[b], vc), 24)
        va = ops.add_many([va, vb, y])
        vd = ops.rotr(ops.xor(vd, va), 16)
        vc = ops.add(vc, vd)
        vb = ops.rotr(ops.xor(vb, vc), 63)
        v[a], v[b], v[c], v[d] = va, vb, vc, vd

    for r in range(12):
        s = _BLAKE2B_SIGMA[r]
        G(0, 4, 8, 12, m[s[0]], m[s[1]])
        G(1, 5, 9, 13, m[s[2]], m[s[3]])
        G(2, 6, 10, 14, m[s[4]], m[s[5]])
        G(3, 7, 11, 15, m[s[6]], m[s[7]])
        G(0, 5, 10, 15, m[s[8]], m[s[9]])
        G(1, 6, 11, 12, m[s[10]], m[s[11]])
        G(2, 7, 8, 13, m[s[12]], m[s[13]])
        G(3, 4, 9, 14, m[s[14]], m[s[15]])

    outs = [ops.xor(hw[i], v[i], v[i + 8]) for i in range(8)]
    prog.outputs = [bit for wd in outs for bit in wd.bits]
    return prog


def _u64_bits_le(v: int) -> List[int]:
    return [(v >> i) & 1 for i in range(64)]


def blake2b_256_gate(data: bytes) -> bytes:
    """Blake2b-256 (digest_size=32, no key) via the gate program."""
    prog = build_blake2b_compress_program()
    h = list(_BLAKE2B_IV)
    h[0] ^= 0x01010000 ^ 32   # param block: digest_size=32, fanout=depth=1
    msg = data if data else b""
    blocks = [msg[i:i + 128] for i in range(0, len(msg), 128)] or [b""]
    t = 0
    for bi, block in enumerate(blocks):
        last = bi == len(blocks) - 1
        t += len(block)
        padded = block + b"\x00" * (128 - len(block))
        m = [int.from_bytes(padded[i * 8:i * 8 + 8], "little")
             for i in range(16)]
        in_bits = []
        for v in h:
            in_bits.extend(_u64_bits_le(v))
        for v in m:
            in_bits.extend(_u64_bits_le(v))
        in_bits.extend(_u64_bits_le(t & (2**64 - 1)))
        in_bits.extend(_u64_bits_le(t >> 64))
        in_bits.extend(_u64_bits_le(2**64 - 1 if last else 0))
        out = evaluate(prog, np.array(in_bits, dtype=np.uint8)[:, None])[:, 0]
        h = [sum(int(out[i * 64 + k]) << k for k in range(64))
             for i in range(8)]
    return b"".join(v.to_bytes(8, "little") for v in h)[:32]

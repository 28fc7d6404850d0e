"""Binary SM (reference src/sm/binary/binary_executor.cpp:31-460).

Each 256-bit operation expands to LATCH_SIZE = 16 rows processing 2 bytes
per row (little-endian), with byte-level carry chains per opcode and the
a/b/c registers accumulating across the cycle.  Opcodes: 0 ADD, 1 SUB,
2 LT, 3 SLT, 4 EQ, 5 AND, 6 OR, 7 XOR (carry/useCarry semantics per the
reference FACTOR/carry tables).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

LATCH_SIZE = 16
BYTES_PER_ROW = 2

ADD, SUB, LT, SLT, EQ, AND, OR, XOR = range(8)


def _bytes_le(v: int) -> List[int]:
    return [(v >> (8 * i)) & 0xFF for i in range(32)]


class BinaryExecutor:
    COLUMNS = (
        ["opcode", "cIn", "cMiddle", "cOut", "lCout", "lOpcode", "useCarry",
         "resultBinOp"]
        + [f"freeInA{i}" for i in range(2)]
        + [f"freeInB{i}" for i in range(2)]
        + [f"freeInC{i}" for i in range(2)]
        + [f"a{i}" for i in range(8)]
        + [f"b{i}" for i in range(8)]
        + [f"c{i}" for i in range(8)]
    )

    def execute(self, actions: List[dict], n: int) -> Dict[str, np.ndarray]:
        if len(actions) * LATCH_SIZE > n:
            raise ValueError("binary SM overflow")
        pols = {c: np.zeros(n, dtype=np.uint64) for c in self.COLUMNS}
        row = 0
        for act in actions:
            row = self._fill_action(pols, row, act)
        return pols

    def _carry_step(self, opcode: int, abyte: int, bbyte: int, cbyte: int,
                    cin: int, byte_idx: int, a_full: int, b_full: int) -> int:
        if opcode == ADD:
            return 1 if abyte + bbyte + cin > 0xFF else 0
        if opcode == SUB:
            return 1 if abyte - cin < bbyte else 0
        if opcode in (LT, SLT):
            # carry tracks the running "a < b" from LSB upward
            if abyte < bbyte:
                return 1
            if abyte > bbyte:
                return 0
            return cin
        if opcode == EQ:
            # carry tracks "equal so far"
            if byte_idx == 0:
                return 1 if abyte == bbyte else 0
            return cin if abyte == bbyte else 0
        return 0

    def _fill_action(self, pols, row: int, act: dict) -> int:
        opcode = act["opcode"]
        a = _bytes_le(act["a"])
        b = _bytes_le(act["b"])
        c = _bytes_le(act["c"])
        cin = 0
        acc_a = [0] * 8
        acc_b = [0] * 8
        acc_c = [0] * 8
        use_carry = 1 if opcode in (LT, SLT, EQ) else 0
        carry = cin
        for j in range(LATCH_SIZE):
            r = row + j
            pols["opcode"][r] = opcode
            pols["cIn"][r] = carry
            for kk in range(BYTES_PER_ROW):
                byte_idx = j * BYTES_PER_ROW + kk
                ab, bb, cb = a[byte_idx], b[byte_idx], c[byte_idx]
                pols[f"freeInA{kk}"][r] = ab
                pols[f"freeInB{kk}"][r] = bb
                pols[f"freeInC{kk}"][r] = cb
                limb = byte_idx // 4
                shift = 8 * (byte_idx % 4)
                acc_a[limb] |= ab << shift
                acc_b[limb] |= bb << shift
                acc_c[limb] |= cb << shift
                new_carry = self._carry_step(
                    opcode, ab, bb, cb, carry, byte_idx, act["a"], act["b"]
                )
                if kk == 0:
                    pols["cMiddle"][r] = new_carry
                carry = new_carry
            pols["cOut"][r] = carry
            for i in range(8):
                pols[f"a{i}"][r] = acc_a[i]
                pols[f"b{i}"][r] = acc_b[i]
                pols[f"c{i}"][r] = acc_c[i]
            if j == LATCH_SIZE - 1:
                pols["lCout"][r] = carry
                pols["lOpcode"][r] = opcode
                pols["useCarry"][r] = use_carry
                pols["resultBinOp"][r] = 1
        # SLT final: sign bits flip the comparison
        final = row + LATCH_SIZE - 1
        if opcode == SLT:
            sa = (act["a"] >> 255) & 1
            sb = (act["b"] >> 255) & 1
            if sa != sb:
                pols["lCout"][final] = 1 if sa == 1 else 0
        self._check(act, int(pols["lCout"][final]))
        return row + LATCH_SIZE

    @staticmethod
    def _check(act: dict, carry_out: int):
        a, b, c, opcode = act["a"], act["b"], act["c"], act["opcode"]
        m = (1 << 256) - 1
        if opcode == ADD:
            ok = c == (a + b) & m and carry_out == (1 if a + b > m else 0)
        elif opcode == SUB:
            ok = c == (a - b) & m and carry_out == (1 if a < b else 0)
        elif opcode == LT:
            ok = (c == (1 if a < b else 0)) and carry_out == c
        elif opcode == SLT:
            sa = a - (1 << 256) if a >> 255 else a
            sb = b - (1 << 256) if b >> 255 else b
            ok = (c == (1 if sa < sb else 0)) and carry_out == c
        elif opcode == EQ:
            ok = c == (1 if a == b else 0)
        elif opcode == AND:
            ok = c == a & b
        elif opcode == OR:
            ok = c == a | b
        elif opcode == XOR:
            ok = c == a ^ b
        else:
            ok = True
        if not ok:
            raise ValueError(f"binary trace check failed: {act}")

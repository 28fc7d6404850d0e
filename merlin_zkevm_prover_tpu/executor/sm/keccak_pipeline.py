"""The Keccak proving pipeline: PaddingKK -> PaddingKKBit -> Bits2Field ->
KeccakF (reference src/sm/padding_kk/, padding_kkbit/, bits2field/,
keccak_f/), with the reference's exact committed-column layouts.

  * PaddingKK: one row per byte of every keccak stream padded to
    136-byte rate blocks; rem/remInv/spare length tracking, connected,
    hash0-7 (digest 8x32-bit chunks pinned over the stream), incCounter,
    lastHashLen/lastHashDigest, and the crLen/crOffset/crF/crV chunk-read
    helpers (identical scheme to PaddingPG);
  * PaddingKKBit: 1993-row slots: 136 bytes x (8 bit-rows + 1 latch row)
    absorbing into the sponge state, 512 capacity rows, 256 sOut
    accumulate rows (digest packed 8x32-bit big-endian chunks), 1 final
    row; sOutBit carries the previous permutation's output so
    sInBit = connected ? sOutBit ^ rBit : rBit chains the sponge;
  * Bits2Field: packs bit b of 44 consecutive KKBit slots into one
    44-bit field element aligned with the KeccakF Sin/Sout rows
    (bits2field_executor.cpp comment layout);
  * KeccakF: evaluates the row-allocated gate script (keccak_layout.py)
    over the packed words, one gate per row, operands copied into the
    row's a/b pins, values split into 4 x 11-bit limb columns
    (keccak_f_executor.cpp setPol).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ...ops.goldilocks import P
from ...utils.keccak import keccak256
from .gate import ANDP, XOR
from .keccak_layout import (
    MASK44,
    PIN_A,
    PIN_B,
    PIN_C,
    SIN_REF0,
    SOUT_REF0,
    ZERO_REF,
    build_keccak_script,
    n_slots,
)

RATE_BYTES = 136
KKBIT_SLOT = 136 * 9 + 512 + 256 + 1  # 1993


def pad_keccak(data: bytes) -> bytes:
    """pad10*1 to a multiple of the 136-byte rate."""
    pad_len = RATE_BYTES - (len(data) % RATE_BYTES)
    if pad_len == 1:
        return data + b"\x81"
    return data + b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"


EMPTY_BLOCK = pad_keccak(b"")


class PaddingKKExecutor:
    """reference padding_kk_executor.cpp."""

    def execute(self, inputs: List[dict], n: int
                ) -> Tuple[Dict[str, np.ndarray], List[dict]]:
        cols = (["freeIn", "connected", "addr", "rem", "remInv", "spare",
                 "lastHashLen", "lastHashDigest", "len", "incCounter",
                 "crOffset", "crLen", "crOffsetInv"]
                + [f"hash{k}" for k in range(8)]
                + [f"crF{k}" for k in range(8)]
                + [f"crV{k}" for k in range(8)])
        pols = {c: np.zeros(n, dtype=np.uint64) for c in cols}
        n_total_blocks = 44 * n_slots(n)
        kkbit_inputs: List[dict] = []
        p = 0
        addr = 0
        for inp in inputs:
            data = inp["data"] if isinstance(inp, dict) else bytes(inp)
            reads = inp.get("reads", []) if isinstance(inp, dict) else []
            len_called = inp.get("lenCalled", False) \
                if isinstance(inp, dict) else False
            digest_called = inp.get("digestCalled", True) \
                if isinstance(inp, dict) else True
            if isinstance(inp, dict) and "addr" in inp:
                addr = int(inp["addr"])
            padded = pad_keccak(data)
            real_len = len(data)
            digest = int.from_bytes(keccak256(data), "big")
            if p + len(padded) > 136 * n_total_blocks:
                raise ValueError("PaddingKK overflow")
            cur_read = -1
            last_offset = 0
            for j, byte in enumerate(padded):
                pols["freeIn"][p] = byte
                pols["len"][p] = real_len
                pols["addr"][p] = addr
                if j >= RATE_BYTES:
                    pols["connected"][p] = 1
                rem = (real_len - j) % P
                pols["rem"][p] = rem
                if rem:
                    pols["remInv"][p] = pow(rem, P - 2, P)
                    if rem > P // 2:
                        pols["spare"][p] = 1
                pols["incCounter"][p] = j // RATE_BYTES + 1
                last_block = (p % RATE_BYTES) == RATE_BYTES - 1
                last_hash = last_block and (pols["spare"][p] or rem == 0)
                if last_hash:
                    if len_called:
                        pols["lastHashLen"][p] = 1
                    if digest_called:
                        pols["lastHashDigest"][p] = 1
                if last_offset == 0:
                    cur_read += 1
                    cr_len = reads[cur_read] if cur_read < len(reads) else 1
                    pols["crLen"][p] = cr_len
                    pols["crOffset"][p] = cr_len - 1
                else:
                    pols["crLen"][p] = pols["crLen"][p - 1]
                    pols["crOffset"][p] = int(pols["crOffset"][p - 1]) - 1
                cro = int(pols["crOffset"][p])
                if cro:
                    pols["crOffsetInv"][p] = pow(cro, P - 2, P)
                cr_acci, cr_sh = cro // 4, (cro % 4) * 8
                pols[f"crF{cr_acci}"][p] = 1 << cr_sh
                if cro and p + 1 < n:
                    for k in range(8):
                        v = int(pols[f"crV{k}"][p])
                        if k == cr_acci:
                            v += byte << cr_sh
                        pols[f"crV{k}"][p + 1] = v
                last_offset = cro

                if last_block:
                    kkbit_inputs.append({
                        "data": padded[j - RATE_BYTES + 1: j + 1],
                        "connected": j >= RATE_BYTES,
                    })
                    if j == len(padded) - 1:
                        for k in range(8):
                            chunk = (digest >> (32 * k)) & 0xFFFFFFFF
                            pols[f"hash{k}"][p - len(padded) + 1: p + 1] = \
                                chunk
                p += 1
            addr += 1

        # unused full blocks: the padded empty block
        while p + RATE_BYTES <= 136 * n_total_blocks:
            for j, byte in enumerate(EMPTY_BLOCK):
                pols["addr"][p] = addr
                if j == 0:
                    pols["freeIn"][p] = 1
                else:
                    if j == RATE_BYTES - 1:
                        pols["freeIn"][p] = 0x80
                    rem = (-j) % P
                    pols["rem"][p] = rem
                    pols["remInv"][p] = pow(rem, P - 2, P)
                    pols["spare"][p] = 1
                pols["incCounter"][p] = 1
                pols["crLen"][p] = 1
                pols["crF0"][p] = 1
                if j == RATE_BYTES - 1:
                    kkbit_inputs.append({"data": EMPTY_BLOCK,
                                         "connected": False})
                    d0 = int.from_bytes(keccak256(b""), "big")
                    for k in range(8):
                        pols[f"hash{k}"][p - RATE_BYTES + 1: p + 1] = \
                            (d0 >> (32 * k)) & 0xFFFFFFFF
                p += 1
            addr += 1

        # structureless tail
        fp = p
        while p < n:
            pols["addr"][p] = addr
            if p != fp:
                rem = (int(pols["rem"][p - 1]) - 1) % P
                pols["rem"][p] = rem
                if rem:
                    pols["remInv"][p] = pow(rem, P - 2, P)
                pols["spare"][p] = 1
            pols["incCounter"][p] = 1
            pols["crLen"][p] = 1
            pols["crF0"][p] = 1
            p += 1
        return pols, kkbit_inputs


def _keccak_f_bytes(state: bytes) -> bytes:
    """keccak-f[1600] on a 200-byte state (little-endian bit order)."""
    from ...utils.keccak import keccak_f

    lanes = [int.from_bytes(state[8 * i: 8 * i + 8], "little")
             for i in range(25)]
    out = keccak_f(lanes)
    return b"".join(w.to_bytes(8, "little") for w in out)


class PaddingKKBitExecutor:
    """reference padding_kkbit_executor.cpp."""

    def execute(self, blocks: List[dict], n: int
                ) -> Tuple[Dict[str, np.ndarray], List[Tuple[bytes, bytes]]]:
        """blocks: [{data: 136 bytes, connected}] -> (pols, slot states
        [(state_with_r 200B, out_state 200B)])."""
        slots = 44 * n_slots(n)
        if len(blocks) > slots:
            raise ValueError("PaddingKKBit overflow")
        cols = (["rBit", "sOutBit", "r8", "connected"]
                + [f"sOut{k}" for k in range(8)])
        pols = {c: np.zeros(n, dtype=np.uint64) for c in cols}
        required: List[Tuple[bytes, bytes]] = []
        cur_state = bytearray(200)
        cur_written = False
        p = 0
        for s in range(slots):
            blk = blocks[s] if s < len(blocks) else None
            connected = bool(blk and blk["connected"])
            state_r = bytearray(cur_state) if connected else bytearray(200)
            for j in range(RATE_BYTES):
                byte = blk["data"][j] if blk else 0
                pols["r8"][p] = 0
                for k in range(8):
                    bit = (byte >> k) & 1
                    state_r[j] ^= bit << k
                    pols["rBit"][p] = bit
                    pols["r8"][p + 1] = int(pols["r8"][p]) | (bit << k)
                    if cur_written:
                        pols["sOutBit"][p] = \
                            (cur_state[j] >> k) & 1
                    if connected:
                        pols["connected"][p] = 1
                    p += 1
                if connected:
                    pols["connected"][p] = 1
                p += 1
            for j in range(512):
                if cur_written:
                    byte_i, bit_i = (1088 + j) // 8, (1088 + j) % 8
                    pols["sOutBit"][p] = (cur_state[byte_i] >> bit_i) & 1
                if connected:
                    pols["connected"][p] = 1
                p += 1
            out_state = bytearray(_keccak_f_bytes(bytes(state_r)))
            required.append((bytes(state_r), bytes(out_state)))
            cur_state = out_state
            cur_written = True
            for j in range(256):
                bit = (cur_state[j // 8] >> (j % 8)) & 1
                pols["sOutBit"][p] = bit
                if connected:
                    pols["connected"][p] = 1
                byte = j // 8
                chunk = 7 - byte // 4
                sh = (3 - byte % 4) * 8 + j % 8
                for k in range(8):
                    v = int(pols[f"sOut{k}"][p])
                    if k == chunk:
                        v |= bit << sh
                    pols[f"sOut{k}"][p + 1] = v
                p += 1
            if connected:
                pols["connected"][p] = 1
            p += 1
        # connect the last state back into slot 0's sOutBit rows
        if slots == 0:
            return pols, required
        pp = 0
        for j in range(RATE_BYTES):
            for k in range(8):
                pols["sOutBit"][pp] = (cur_state[j] >> k) & 1
                pp += 1
            pols["sOutBit"][pp] = 0
            pp += 1
        for j in range(512):
            byte_i, bit_i = (1088 + j) // 8, (1088 + j) % 8
            pols["sOutBit"][pp] = (cur_state[byte_i] >> bit_i) & 1
            pp += 1
        return pols, required


class Bits2FieldExecutor:
    """reference bits2field_executor.cpp: 44-slot bit packing aligned
    with the KeccakF gate rows."""

    def execute(self, states: List[Tuple[bytes, bytes]], n: int
                ) -> Tuple[Dict[str, np.ndarray], List[List[int]]]:
        S = build_keccak_script().slot_size
        ns = n_slots(n)
        if len(states) > ns * 44:
            raise ValueError("Bits2Field overflow")
        bit_col = np.zeros(n, dtype=np.uint64)
        field_col = np.zeros(n, dtype=np.uint64)
        keccakf_slots: List[List[int]] = []

        def get_bit(block: int, output: bool, pos: int) -> int:
            if block >= len(states):
                return 0
            st = states[block][1 if output else 0]
            return (st[pos // 8] >> (pos % 8)) & 1

        p = 1
        for i in range(ns):
            slot_words: List[int] = []
            acc = 0
            for j in range(1600):
                for k in range(44):
                    b = get_bit(i * 44 + k, False, j)
                    bit_col[p] = b
                    field_col[p] = acc
                    acc = b if k == 0 else acc | (b << k)
                    p += 1
                slot_words.append(acc)
            for j in range(1600):
                for k in range(44):
                    b = get_bit(i * 44 + k, True, j)
                    bit_col[p] = b
                    field_col[p] = acc
                    acc = b if k == 0 else acc | (b << k)
                    p += 1
            keccakf_slots.append(slot_words)
            field_col[p] = acc
            acc = 0
            p += 1
            p += S - (3200 * 44 + 1)
        return {"bit": bit_col, "field44": field_col}, keccakf_slots


class KeccakFExecutor:
    """reference keccak_f_executor.cpp over the row-allocated script:
    one gate per row, operand values copied into the row's a/b pins,
    11-bit limb split."""

    def execute(self, slots: List[List[int]], n: int
                ) -> Dict[str, np.ndarray]:
        script = build_keccak_script()
        S = script.slot_size
        ns = n_slots(n)
        assert len(slots) <= ns, "KeccakF slot overflow"
        a = np.zeros(n, dtype=np.uint64)
        b = np.zeros(n, dtype=np.uint64)
        c = np.zeros(n, dtype=np.uint64)
        # ZeroRef row: a=0, b=all-ones, c=a^b
        b[0] = MASK44
        c[0] = MASK44
        self.out_words: List[List[int]] = []
        for s in range(ns):
            base = s * S
            words = slots[s] if s < len(slots) else [0] * 1600
            for i, w in enumerate(words):
                a[base + SIN_REF0 + 44 * i] = w

            def val(ref: int, pin: int) -> int:
                r = ref if ref == ZERO_REF else base + ref
                col = (a, b, c)[pin]
                return int(col[r])

            for (op, ra, pa, rb, pb, rr) in script.instructions:
                va = val(ra, pa)
                vb = val(rb, pb)
                r = base + rr
                a[r] = va
                b[r] = vb
                c[r] = (va ^ vb) if op == XOR else ((~va) & vb & MASK44)
            self.out_words.append(
                [int(a[base + SOUT_REF0 + 44 * i]) for i in range(1600)])
        return _split11({"a": a, "b": b, "c": c})


def _split11(packed: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for name, col in packed.items():
        for k in range(4):
            out[f"{name}{k}"] = (col >> np.uint64(11 * k)) & np.uint64(0x7FF)
    return out


def run_keccak_pipeline(inputs: List, n: int) -> Dict[str, Dict]:
    """Full pipeline; returns per-SM pols + digests (oracle-checked
    against keccak256 in tests)."""
    pkk = PaddingKKExecutor()
    pkkb = PaddingKKBitExecutor()
    b2f = Bits2FieldExecutor()
    kf = KeccakFExecutor()
    kk_pols, blocks = pkk.execute(inputs, n)
    bit_pols, states = pkkb.execute(blocks, n)
    b2f_pols, packed = b2f.execute(states, n)
    kf_pols = kf.execute(packed, n)

    digests: Dict[int, bytes] = {}
    for idx, inp in enumerate(inputs):
        data = inp["data"] if isinstance(inp, dict) else bytes(inp)
        key = inp.get("addr", idx) if isinstance(inp, dict) else idx
        digests[key] = keccak256(data)
    return {
        "paddingKK": kk_pols,
        "paddingKKBit": bit_pols,
        "bits2field": b2f_pols,
        "keccakF": kf_pols,
        "digests": digests,
        "states": states,
    }

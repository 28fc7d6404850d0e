"""PaddingPG SM (reference src/sm/padding_pg/padding_pg_executor.cpp).

One row per byte of every Poseidon ("hashP") stream, padded with
0x01..0x80 to 56-byte blocks (8 felts x 7 bytes).  Registers: acc[8]
(byte-packed block), prevHash/curHash (chained digests: the capacity of
each permutation is the previous block's hash), rem/remInv/spare (bytes
remaining; spare = past-the-end), len/addr, incCounter, lastHashLen/
lastHashDigest flags, and the chunk-read helper columns crLen/crOffset/
crOffsetInv/crF0-7/crV0-7 that reconstruct the Main SM's multi-byte
absorb values (reads).  Unused rows repeat the empty-block pattern
whose hash h0 = H(0x01, 0.., 0x80<<48 | cap 0).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ... import native
from ...ops.goldilocks import P

BYTES_PER_BLOCK = 56
BYTES_PER_ELEMENT = 7
N_ELEMENTS = 8


def pad_pg(data: bytes) -> bytes:
    out = bytearray(data)
    out.append(0x01)
    while len(out) % BYTES_PER_BLOCK:
        out.append(0)
    out[-1] |= 0x80
    return bytes(out)


class PaddingPGExecutor:
    COLUMNS = (
        [f"acc{k}" for k in range(N_ELEMENTS)]
        + ["freeIn", "addr", "rem", "remInv", "spare", "lastHashLen",
           "lastHashDigest", "curHash0", "curHash1", "curHash2", "curHash3",
           "prevHash0", "prevHash1", "prevHash2", "prevHash3", "incCounter",
           "len", "crOffset", "crLen", "crOffsetInv"]
        + [f"crF{k}" for k in range(8)]
        + [f"crV{k}" for k in range(8)]
    )

    def execute(self, inputs: List[dict], n: int
                ) -> Tuple[Dict[str, np.ndarray], List[list]]:
        """inputs: [{data, reads, lenCalled, digestCalled}] in addr order.
        Returns (pols, PoseidonG work items of 16 felts: state12+hash4)."""
        required: List[list] = []
        pols = {c: np.zeros(n, dtype=np.uint64) for c in self.COLUMNS}
        p = 0
        addr = 0
        pols["incCounter"][0] = 1
        for inp in inputs:
            data = inp["data"] if isinstance(inp, dict) else bytes(inp)
            reads = inp.get("reads", []) if isinstance(inp, dict) else []
            len_called = inp.get("lenCalled", False) \
                if isinstance(inp, dict) else False
            digest_called = inp.get("digestCalled", True) \
                if isinstance(inp, dict) else True
            if isinstance(inp, dict) and "addr" in inp:
                addr = int(inp["addr"])
            padded = pad_pg(data)
            real_len = len(data)
            if p + len(padded) > n:
                raise ValueError("PaddingPG overflow")
            cur_read = -1
            last_offset = 0
            for j, byte in enumerate(padded):
                nxt = p + 1
                pols["freeIn"][p] = byte
                acci = (j % BYTES_PER_BLOCK) // BYTES_PER_ELEMENT
                sh = (j % BYTES_PER_ELEMENT) * 8
                if nxt < n:
                    for k in range(N_ELEMENTS):
                        v = int(pols[f"acc{k}"][p])
                        if k == acci:
                            v |= byte << sh
                        pols[f"acc{k}"][nxt] = v
                    for c in ("prevHash0", "prevHash1", "prevHash2",
                              "prevHash3", "incCounter"):
                        pols[c][nxt] = pols[c][p]
                pols["len"][p] = real_len
                pols["addr"][p] = addr
                rem = (real_len - j) % P
                pols["rem"][p] = rem
                if rem:
                    pols["remInv"][p] = pow(rem, P - 2, P)
                    if rem > 0xFFFF:
                        pols["spare"][p] = 1
                last_block = (p % BYTES_PER_BLOCK) == BYTES_PER_BLOCK - 1
                last_hash = last_block and (pols["spare"][p] or rem == 0)
                if last_hash:
                    if len_called:
                        pols["lastHashLen"][p] = 1
                    if digest_called:
                        pols["lastHashDigest"][p] = 1
                # chunk-read helper columns
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
                if cro and nxt < n:
                    for k in range(8):
                        v = int(pols[f"crV{k}"][p])
                        if k == cr_acci:
                            v += byte << cr_sh
                        pols[f"crV{k}"][nxt] = v
                last_offset = cro

                if (j % BYTES_PER_BLOCK) == BYTES_PER_BLOCK - 1:
                    state = [int(pols[f"acc{k}"][nxt]) if nxt < n else 0
                             for k in range(N_ELEMENTS)]
                    # re-derive the final acc for the wrap case
                    if nxt >= n:
                        state = [int(pols[f"acc{k}"][p]) for k in
                                 range(N_ELEMENTS)]
                        state[acci] |= byte << sh
                    prev = [int(pols[f"prevHash{k}"][p]) for k in range(4)]
                    h = native.poseidon_permute(state + prev)[:4]
                    for b in range(BYTES_PER_BLOCK):
                        for k in range(4):
                            pols[f"curHash{k}"][p - b] = h[k]
                    required.append(state + prev + list(h) + [4])
                    if nxt < n:
                        for k in range(N_ELEMENTS):
                            pols[f"acc{k}"][nxt] = 0
                        stream_end = j == len(padded) - 1
                        for k in range(4):
                            pols[f"prevHash{k}"][nxt] = \
                                0 if stream_end else h[k]
                        pols["incCounter"][nxt] = \
                            1 if stream_end else int(pols["incCounter"][p]) + 1
                p += 1
            addr += 1

        # ---- unused region: empty-block pattern ----
        state0 = [1, 0, 0, 0, 0, 0, 0, 0x80 << 48, 0, 0, 0, 0]
        h0 = native.poseidon_permute(state0)[:4]
        required.append(state0 + list(h0) + [4])
        while p < n:
            block = min(BYTES_PER_BLOCK, n - p)
            if block < 2:
                raise ValueError("PaddingPG tail alignment impossible")
            for j in range(block):
                if j == 0:
                    pols["freeIn"][p] = 1
                elif j == block - 1:
                    pols["freeIn"][p] = 0x80
                if j != 0:
                    pols["acc0"][p] = 1
                    pols["spare"][p] = 1
                pols["addr"][p] = addr
                rem = (-j) % P
                pols["rem"][p] = rem
                if rem:
                    pols["remInv"][p] = pow(rem, P - 2, P)
                for k in range(4):
                    pols[f"prevHash{k}"][p] = 0
                    pols[f"curHash{k}"][p] = h0[k]
                pols["incCounter"][p] = 1
                pols["crLen"][p] = 1
                pols["crF0"][p] = 1
                p += 1
            addr += 1
        return pols, required

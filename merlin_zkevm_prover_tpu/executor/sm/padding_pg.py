"""PaddingPG — Poseidon hash padding SM (reference src/sm/padding_pg/
padding_pg_executor.cpp).

hashP streams are hashed as Poseidon linear hashes over 7-byte
little-endian chunks plus a length felt (same convention as the Main SM's
hashPDigest, main_executor fork_5 hashP blocks).  This SM lays out one row
per input byte, packs 7-byte groups into felt accumulators (acc[8]), and
emits the per-block PoseidonG work items.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ...ops import poseidon_gl

CHUNK = 7
BLOCK_FELTS = 8
BLOCK_BYTES = CHUNK * BLOCK_FELTS  # 56


class PaddingPGExecutor:
    def execute(self, inputs: List[bytes], n: int
                ) -> Tuple[Dict[str, np.ndarray], List[list]]:
        """Returns (pols, poseidon_g required actions)."""
        free_col = np.zeros(n, dtype=np.uint64)
        rem_col = np.zeros(n, dtype=np.uint64)
        addr_col = np.zeros(n, dtype=np.uint64)
        acc_cols = np.zeros((BLOCK_FELTS, n), dtype=np.uint64)
        last_block = np.zeros(n, dtype=np.uint64)
        cur_hash = np.zeros((4, n), dtype=np.uint64)
        required: List[list] = []
        row = 0
        for si, data in enumerate(inputs):
            data = bytes(data)
            felts = [
                int.from_bytes(data[off:off + CHUNK], "little")
                for off in range(0, len(data), CHUNK)
            ] + [len(data)]
            # digest via the sponge, recording per-chunk permutations
            digest = [0, 0, 0, 0]
            size = len(felts)
            if size > 4:
                digest = [0, 0, 0, 0]
                for off in range(0, size, 8):
                    chunk = felts[off:off + 8]
                    chunk = chunk + [0] * (8 - len(chunk))
                    state = chunk + digest
                    required.append(list(state))
                    digest = poseidon_gl.permute_host(state)[:4]
            else:
                digest = list(felts) + [0] * (4 - size)
            n_pad = (-len(data)) % BLOCK_BYTES or 0
            padded = data + b"\x00" * n_pad
            total = len(padded) or BLOCK_BYTES
            acc = [0] * BLOCK_FELTS
            for pos in range(total):
                if row >= n:
                    raise AssertionError("PaddingPG overflow")
                byte = padded[pos] if pos < len(padded) else 0
                k = (pos % BLOCK_BYTES) // CHUNK
                sh = 8 * (pos % CHUNK)
                acc[k] |= byte << sh
                free_col[row] = byte
                rem_col[row] = max(len(data) - pos, 0)
                addr_col[row] = si
                for j in range(BLOCK_FELTS):
                    acc_cols[j, row] = acc[j]
                last_block[row] = 1 if pos >= total - BLOCK_BYTES else 0
                for j in range(4):
                    cur_hash[j, row] = digest[j]
                if (pos + 1) % BLOCK_BYTES == 0:
                    acc = [0] * BLOCK_FELTS
                row += 1
        pols = {
            "freeIn": free_col,
            "rem": rem_col,
            "addr": addr_col,
            "lastBlock": last_block,
        }
        for j in range(BLOCK_FELTS):
            pols[f"acc{j}"] = acc_cols[j]
        for j in range(4):
            pols[f"curHash{j}"] = cur_hash[j]
        return pols, required

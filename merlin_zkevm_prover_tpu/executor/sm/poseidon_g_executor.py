"""PoseidonG SM (reference src/sm/poseidon_g/poseidon_g_executor.cpp).

Each hash occupies 31 rows: the input row followed by one row per round
(30 rounds); columns in0..in7/hashType/cap1..3 carry the rolling state and
hash0..3 pin the result across the slot.  Unused rows repeat the
all-zeros-input round trace (reference :227-292).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ...ops import poseidon_gl
from ...ops.goldilocks import P
from ...ops.poseidon_constants import MDS, N_FULL_ROUNDS, N_PARTIAL_ROUNDS, \
    ROUND_CONSTANTS, WIDTH

SLOT_ROWS = N_FULL_ROUNDS + N_PARTIAL_ROUNDS + 1  # 31


def _round(state: List[int], r: int) -> List[int]:
    st = [(state[s] + ROUND_CONSTANTS[r * WIDTH + s]) % P for s in range(12)]
    if r < N_FULL_ROUNDS // 2 or r >= N_FULL_ROUNDS // 2 + N_PARTIAL_ROUNDS:
        st = [pow(x, 7, P) for x in st]
    else:
        st[0] = pow(st[0], 7, P)
    return [sum(MDS[x][y] * st[y] for y in range(12)) % P for x in range(12)]


class PoseidonGExecutor:
    STATE_COLS = ["in0", "in1", "in2", "in3", "in4", "in5", "in6", "in7",
                  "hashType", "cap1", "cap2", "cap3"]
    COLUMNS = STATE_COLS + ["hash0", "hash1", "hash2", "hash3",
                            "result1", "result2", "result3"]

    # permutation-id -> result flag column (reference
    # poseidon_g_permutation.hpp: 1 = Main Kin0 key hash, 2 = Main Kin1,
    # 3 = Storage SMT node hash, 4 = PaddingPG — no committed flag)
    RESULT_COLS = {1: "result1", 2: "result2", 3: "result3", 4: None}

    def execute(self, inputs: List[List[int]], n: int) -> Dict[str, np.ndarray]:
        """inputs: list of 12-felt states (optionally 16/17 with expected
        hash + permutation id, reference input[i][12..16])."""
        max_hashes = n // SLOT_ROWS
        if len(inputs) > max_hashes:
            raise ValueError(
                f"PoseidonG overflow: {len(inputs)} > {max_hashes}"
            )
        pols = {c: np.zeros(n, dtype=np.uint64) for c in self.COLUMNS}
        row = 0
        for inp in inputs:
            state = [int(v) % P for v in inp[:12]]
            final = poseidon_gl.permute_host(state)
            digest = final[:4]
            if len(inp) >= 16:
                expect = [int(v) for v in inp[12:16]]
                if expect != digest:
                    raise ValueError("PoseidonG digest mismatch")
            for r in range(SLOT_ROWS):
                for ci, col in enumerate(self.STATE_COLS):
                    pols[col][row] = state[ci]
                for hi in range(4):
                    pols[f"hash{hi}"][row] = digest[hi]
                if r == 0:
                    perm_id = int(inp[16]) if len(inp) >= 17 else 1
                    rcol = self.RESULT_COLS[perm_id]
                    if rcol is not None:
                        pols[rcol][row] = 1
                if r < SLOT_ROWS - 1:
                    state = _round(state, r)
                row += 1
        # pad remaining COMPLETE slots with the zero-state round trace;
        # the trailing n % 31 rows form the dead zone gated by LAST=1 in
        # the constants (31 does not divide a power-of-two domain)
        full = (n // SLOT_ROWS) * SLOT_ROWS
        if row < full:
            zero_states = [[0] * 12]
            st = [0] * 12
            for r in range(SLOT_ROWS - 1):
                st = _round(st, r)
                zero_states.append(list(st))
            zero_digest = zero_states[-1][:4]
            k = 0
            while row < full:
                for ci, col in enumerate(self.STATE_COLS):
                    pols[col][row] = zero_states[k % SLOT_ROWS][ci]
                for hi in range(4):
                    pols[f"hash{hi}"][row] = zero_digest[hi]
                row += 1
                k += 1
        return pols

"""Storage SM (reference src/sm/storage/storage_executor.cpp, 1,239 LoC).

Expands the Main SM's SMT get/set actions into the Storage.* trace by
replaying the Merkle climb against the state database: walk the path to
the leaf, then hash back up through the recorded siblings, verifying the
claimed root and emitting one trace row + one PoseidonG work item per
hash.  The reference drives the same climbs through its micro-ROM
(storage_sm_rom.json); the micro-ROM interpreter form is the scheduled
refinement of this executor.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ... import native
from ...hashdb.smt import ZERO4, split_key


class StorageExecutor:
    COLUMNS = (
        [f"hashLeft{i}" for i in range(4)]
        + [f"hashRight{i}" for i in range(4)]
        + [f"oldRoot{i}" for i in range(4)]
        + [f"newRoot{i}" for i in range(4)]
        + [f"rkey{i}" for i in range(4)]
        + ["level", "rkeyBit", "isSet", "isGet", "latch"]
    )

    def execute(self, actions: List[dict], n: int, hashdb=None,
                required_poseidon: Optional[List[list]] = None
                ) -> Dict[str, np.ndarray]:
        """actions: Main SM storage `required` entries ({'op', 'root',
        'key', 'value'[, 'newRoot']}); hashdb resolves tree nodes."""
        pols = {c: np.zeros(n, dtype=np.uint64) for c in self.COLUMNS}
        row = 0
        for act in actions:
            row = self._replay(pols, row, act, n, hashdb, required_poseidon)
        return pols

    def _replay(self, pols, row, act, n, hashdb, req_pg):
        is_set = 1 if act["op"] == "set" else 0
        # verify against the post-state root for sets, pre-state for gets
        root = tuple(act.get("newRoot") or act["root"])
        key = tuple(act["key"])
        path = split_key(key)

        # walk down recording the branch nodes
        chain = []           # (node12, bit) from root downward
        r = root
        level = 0
        db = hashdb.db if hashdb is not None else None
        while r != ZERO4 and db is not None:
            v = db.read_node(r)
            if v is None:
                raise ValueError(f"storage replay: missing node {r}")
            if v[8] == 1:    # leaf
                chain.append((list(v), None))
                break
            chain.append((list(v), path[level]))
            r = tuple(v[0:4]) if path[level] == 0 else tuple(v[4:8])
            level += 1

        # climb back up, verifying each hash and emitting a row
        computed = ZERO4
        for depth in range(len(chain) - 1, -1, -1):
            node, bit = chain[depth]
            left, right = tuple(node[0:4]), tuple(node[4:8])
            cap = [1, 0, 0, 0] if bit is None else [0, 0, 0, 0]
            state = list(left) + list(right) + cap
            computed = tuple(native.poseidon_permute(state)[:4])
            if req_pg is not None:
                req_pg.append(state)
            if row >= n:
                raise ValueError("storage SM overflow")
            for i in range(4):
                pols[f"hashLeft{i}"][row] = left[i]
                pols[f"hashRight{i}"][row] = right[i]
                pols[f"oldRoot{i}"][row] = act["root"][i]
                pols[f"newRoot{i}"][row] = root[i]
                pols[f"rkey{i}"][row] = key[i]
            pols["level"][row] = depth
            pols["rkeyBit"][row] = path[depth] if depth < 256 else 0
            pols["isSet"][row] = is_set
            pols["isGet"][row] = 1 - is_set
            row += 1
        if chain:
            expect = root
            # the topmost computed hash must equal the tree root
            top_node = chain[0][0]
            cap = [1, 0, 0, 0] if chain[0][1] is None else [0, 0, 0, 0]
            top = tuple(native.poseidon_permute(
                list(top_node[0:8]) + cap)[:4])
            if top != expect:
                raise ValueError(
                    f"storage replay root mismatch: {top} != {expect}"
                )
            pols["latch"][row - 1] = 1
        return row

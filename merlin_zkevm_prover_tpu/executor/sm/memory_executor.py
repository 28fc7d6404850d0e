"""Memory SM (reference src/sm/memory/memory_executor.cpp).

Sorts the Main SM's memory accesses by (addr, step) and fills the Mem.*
columns: addr, step, mOp, mWr, val[8], lastAccess — the access-ordered
trace whose constraints enforce read-after-write consistency.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


class MemoryExecutor:
    COLUMNS = ["addr", "step", "mOp", "mWr", "lastAccess"] + \
        [f"val{i}" for i in range(8)]

    def execute(self, accesses: List[dict], n: int) -> Dict[str, np.ndarray]:
        ordered = sorted(accesses, key=lambda a: (a["addr"], a["step"]))
        if len(ordered) > n:
            raise ValueError(f"memory SM overflow: {len(ordered)} > {n}")
        pols = {c: np.zeros(n, dtype=np.uint64) for c in self.COLUMNS}
        for i, acc in enumerate(ordered):
            pols["addr"][i] = acc["addr"]
            pols["step"][i] = acc["step"]
            pols["mOp"][i] = 1
            pols["mWr"][i] = 1 if acc["wr"] else 0
            for k in range(8):
                pols[f"val{k}"][i] = acc["value"][k]
            last = (i + 1 == len(ordered)
                    or ordered[i + 1]["addr"] != acc["addr"])
            pols["lastAccess"][i] = 1 if last else 0
        # the cyclic wrap closes the access chain: the final domain row
        # must flag lastAccess (mem.pil:30 (lastAccess-1)*LLAST == 0)
        pols["lastAccess"][n - 1] = 1
        self._validate(ordered)
        return pols

    @staticmethod
    def _validate(ordered: List[dict]):
        current: Dict[int, List[int]] = {}
        for acc in ordered:
            if acc["wr"]:
                current[acc["addr"]] = list(acc["value"])
            else:
                expect = current.get(acc["addr"], [0] * 8)
                if list(acc["value"]) != expect:
                    raise ValueError(
                        f"memory read inconsistency at addr={acc['addr']}"
                    )

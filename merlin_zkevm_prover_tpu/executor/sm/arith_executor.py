"""Arith SM (reference src/sm/arith/arith_executor.cpp + sm_arith_eq*.cpp).

Operands are decomposed into 16 x 16-bit limbs; each action spans 32 rows
with per-row carry columns.  Equations (selEq selectors):
  eq0: x1*y1 + x2 = y2*2^256 + y3                  (256-bit mul/add)
  eq1-4: secp256k1 point add/double equations (x/y coordinates with the
  s slope and q quotient limbs against FPEC).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

FPEC = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
ROWS_PER_ACTION = 32
N_LIMBS = 16


def limbs16(v: int) -> List[int]:
    return [(v >> (16 * i)) & 0xFFFF for i in range(N_LIMBS)]


class ArithExecutor:
    VEC_COLS = ["x1", "y1", "x2", "y2", "x3", "y3", "s", "q0", "q1", "q2"]
    COLUMNS = (
        [f"{c}_{i}" for c in VEC_COLS for i in range(N_LIMBS)]
        + ["selEq0", "selEq1", "selEq2", "selEq3",
           "resultEq0", "resultEq1", "resultEq2"]
    )

    def execute(self, actions: List[dict], n: int) -> Dict[str, np.ndarray]:
        if len(actions) * ROWS_PER_ACTION > n:
            raise ValueError("arith SM overflow")
        pols = {c: np.zeros(n, dtype=np.uint64) for c in self.COLUMNS}
        row = 0
        for act in actions:
            self._check(act)
            vals = {
                "x1": act["x1"], "y1": act["y1"], "x2": act["x2"],
                "y2": act["y2"], "x3": act.get("x3", 0),
                "y3": act.get("y3", 0), "s": act.get("s", 0),
                "q0": act.get("q0", 0), "q1": act.get("q1", 0),
                "q2": act.get("q2", 0),
            }
            for r in range(ROWS_PER_ACTION):
                for c in self.VEC_COLS:
                    lv = limbs16(vals[c])
                    for i in range(N_LIMBS):
                        pols[f"{c}_{i}"][row + r] = lv[i]
                pols[f"selEq{min(act.get('eq', 0), 3)}"][row + r] = 1
            pols["resultEq0"][row + ROWS_PER_ACTION - 1] = \
                1 if act.get("eq", 0) == 0 else 0
            row += ROWS_PER_ACTION
        return pols

    @staticmethod
    def _check(act: dict):
        eq = act.get("eq", 0)
        if eq == 0:
            # x1*y1 + x2 = y2*2^256 + y3
            lhs = act["x1"] * act["y1"] + act["x2"]
            rhs = (act["y2"] << 256) + act["y3"]
            if lhs != rhs:
                raise ValueError("arith eq0 check failed")
        elif eq in (1, 2):
            # point addition: s*(x2 - x1) = y2 - y1 (mod FPEC)  [eq1]
            #                 2*y1*s = 3*x1^2 (mod FPEC)        [eq2 double]
            if eq == 1:
                if (act["s"] * (act["x2"] - act["x1"]) -
                        (act["y2"] - act["y1"])) % FPEC != 0:
                    raise ValueError("arith eq1 check failed")
            else:
                if (2 * act["y1"] * act["s"] -
                        3 * act["x1"] * act["x1"]) % FPEC != 0:
                    raise ValueError("arith eq2 check failed")
            # shared: x3 = s^2 - x1 - x2, y3 = s*(x1 - x3) - y1 (mod FPEC)
            if (act["s"] ** 2 - act["x1"] - act["x2"] -
                    act["x3"]) % FPEC != 0:
                raise ValueError("arith x3 check failed")
            if (act["s"] * (act["x1"] - act["x3"]) - act["y1"] -
                    act["y3"]) % FPEC != 0:
                raise ValueError("arith y3 check failed")

"""Arith SM (reference src/sm/arith/arith_executor.cpp + sm_arith_eq*.cpp).

Operands are decomposed into 16 x 16-bit limbs; each action spans 32 rows.
Equation selectors (reference ArithAction selEq0-3, arith_executor.cpp:18-60):
  selEq0: x1*y1 + x2 = y2*2^256 + y3               (256-bit mul/add)
  selEq1: s*(x2 - x1) = y2 - y1 + q0*p             (EC add slope)
  selEq2: 2*y1*s = 3*x1^2 + q0*p                   (EC double slope)
  selEq3: x3 = s^2 - x1 - x2 - q1*p,
          y3 = s*(x1 - x3) - y1 - q2*p             (EC result coords)

The s slope and q quotients are derived here exactly as the reference
executor does before limb decomposition.
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
        + ["selEq0", "selEq1", "selEq2", "selEq3"]
    )

    def execute(self, actions: List[dict], n: int) -> Dict[str, np.ndarray]:
        if len(actions) * ROWS_PER_ACTION > n:
            raise ValueError("arith SM overflow")
        pols = {c: np.zeros(n, dtype=np.uint64) for c in self.COLUMNS}
        row = 0
        for act in actions:
            vals = self._prepare(dict(act))
            for r in range(ROWS_PER_ACTION):
                for c in self.VEC_COLS:
                    lv = limbs16(vals[c])
                    for i in range(N_LIMBS):
                        pols[f"{c}_{i}"][row + r] = lv[i]
                for k in range(4):
                    if vals[f"selEq{k}"]:
                        pols[f"selEq{k}"][row + r] = 1
            row += ROWS_PER_ACTION
        return pols

    @staticmethod
    def _prepare(act: dict) -> dict:
        """Validate the action and derive s/q0/q1/q2 (reference
        arith_executor.cpp slope/quotient derivation)."""
        # normalize legacy format
        if "selEq0" not in act:
            eq = act.get("eq", 0)
            act["selEq0"] = 1 if eq == 0 else 0
            act["selEq1"] = 1 if eq == 1 else 0
            act["selEq2"] = 1 if eq == 2 else 0
            act["selEq3"] = 1 if eq in (1, 2) else 0
        x1, y1 = act["x1"], act["y1"]
        x2, y2 = act["x2"], act["y2"]
        x3, y3 = act.get("x3", 0), act.get("y3", 0)
        s = q0 = q1 = q2 = 0
        if act["selEq0"]:
            if x1 * y1 + x2 != (y2 << 256) + y3:
                raise ValueError("arith eq0 check failed")
        if act["selEq1"]:
            s = (y2 - y1) % FPEC * pow((x2 - x1) % FPEC, FPEC - 2, FPEC) \
                % FPEC
            # s*(x2-x1) - (y2-y1) = q0*p  (q0 offset-encoded positive)
            num = s * (x2 - x1) - (y2 - y1)
            assert num % FPEC == 0, "arith eq1 check failed"
            q0 = (num // FPEC) % (1 << 256)
        if act["selEq2"]:
            s = 3 * x1 * x1 % FPEC * pow(2 * y1 % FPEC, FPEC - 2, FPEC) \
                % FPEC
            num = s * 2 * y1 - 3 * x1 * x1
            assert num % FPEC == 0, "arith eq2 check failed"
            q0 = (num // FPEC) % (1 << 256)
        if act["selEq3"]:
            num = s * s - x1 - x2 - x3
            assert num % FPEC == 0, "arith x3 check failed"
            q1 = (num // FPEC) % (1 << 256)
            num = s * (x1 - x3) - y1 - y3
            assert num % FPEC == 0, "arith y3 check failed"
            q2 = (num // FPEC) % (1 << 256)
        return {
            "x1": x1, "y1": y1, "x2": x2, "y2": y2, "x3": x3, "y3": y3,
            "s": s, "q0": q0, "q1": q1, "q2": q2,
            "selEq0": act["selEq0"], "selEq1": act["selEq1"],
            "selEq2": act["selEq2"], "selEq3": act["selEq3"],
        }

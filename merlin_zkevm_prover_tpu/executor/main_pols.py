"""Main SM committed-polynomial recorder — the 175 columns of the fork_5
Main namespace (reference src/main_sm/fork_5/pols_generated/
commit_pols.hpp:1406-1408; column list from main.pil.json).

The reference writes pols.X[i] inline throughout MainExecutor::execute;
here a recorder snapshots each step: registers at row entry (the row
values), the ROM-line selectors, computed free input, carry/isNeg and the
JMPN decomposition, inverse hints (RCXInv, op0Inv), per-step counter
increments, and the storage-key intermediates (sKeyI/sKey).

The trace is cyclic: row i holds the state *entering* step i; the final
row's setters produce row 0 (checked by the reference checkFinalState).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..ops.goldilocks import P

REG8 = ("A", "B", "C", "D", "E", "SR")
SCALAR_REGS = ("CTX", "SP", "PC", "GAS", "RR", "HASHPOS", "RCX")
IN_SELECTORS = (
    "inA", "inB", "inC", "inROTL_C", "inD", "inE", "inSR", "inFREE",
    "inCTX", "inSP", "inPC", "inGAS", "inSTEP", "inRR", "inHASHPOS",
    "inRCX", "inCntArith", "inCntBinary", "inCntMemAlign", "inCntKeccakF",
    "inCntPoseidonG", "inCntPaddingPG",
)
FLAG_COLS = (
    "setA", "setB", "setC", "setD", "setE", "setSR", "setCTX", "setSP",
    "setPC", "setGAS", "setRR", "setHASHPOS", "setRCX",
    "JMP", "JMPN", "JMPC", "JMPZ", "isStack", "isMem", "ind", "indRR",
    "useCTX", "mOp", "mWR", "sWR", "sRD", "arithEq0", "arithEq1",
    "arithEq2", "memAlignRD", "memAlignWR", "memAlignWR8", "hashK",
    "hashK1", "hashKLen", "hashKDigest", "hashP", "hashP1", "hashPLen",
    "hashPDigest", "bin", "assert", "repeat", "call", "return",
    "useJmpAddr", "useElseAddr",
)
CNT_COLS = ("cntArith", "cntBinary", "cntMemAlign", "cntKeccakF",
            "cntPoseidonG", "cntPaddingPG")


class MainPolsRecorder:
    """Allocates and fills the (N, 175) Main trace."""

    def __init__(self, n: int):
        self.n = n
        self.row = 0
        self.cols: Dict[str, np.ndarray] = {}
        for r in REG8:
            for j in range(8):
                self._add(f"{r}{j}")
        for r in SCALAR_REGS:
            self._add(r)
        self._add("zkPC")
        for j in range(8):
            self._add(f"CONST{j}")
        for j in range(8):
            self._add(f"FREE{j}")
        for c in IN_SELECTORS:
            self._add(c)
        for c in FLAG_COLS:
            self._add(c)
        for c in CNT_COLS:
            self._add(c)
        for c in ("offset", "incStack", "carry", "binOpcode", "isNeg",
                  "incCounter", "lJmpnCondValue", "RCXInv", "op0Inv",
                  "jmpAddr", "elseAddr"):
            self._add(c)
        for j in range(9):
            self._add(f"hJmpnCondValueBit{j}")
        for j in range(4):
            self._add(f"sKeyI{j}")
        for j in range(4):
            self._add(f"sKey{j}")

    def _add(self, name: str):
        self.cols[name] = np.zeros(self.n, dtype=np.uint64)

    @property
    def width(self) -> int:
        return len(self.cols)

    # ------------------------------------------------------------------
    def record(self, ctx, line, op: List[int], free: Optional[List[int]],
               extra: Dict) -> None:
        """One row: ctx registers are the row-entry values (_step snapshots
        them in ctx.final_regs before mutating)."""
        i = self.row
        if i >= self.n:
            raise OverflowError("Main trace overflow")
        regs = ctx.final_regs
        for r in REG8:
            vals = regs[r]
            for j in range(8):
                self.cols[f"{r}{j}"][i] = vals[j]
        for r in SCALAR_REGS:
            self.cols[r][i] = regs[r] % P
        self.cols["zkPC"][i] = ctx.zkPC
        constl = line.constl if line.constl is not None else None
        if constl is not None:
            for j in range(8):
                self.cols[f"CONST{j}"][i] = (constl >> (32 * j)) & 0xFFFFFFFF
        elif line.const is not None:
            self.cols["CONST0"][i] = line.const % P
        if free is not None:
            for j in range(8):
                self.cols[f"FREE{j}"][i] = free[j] % P
        for c in IN_SELECTORS:
            v = line.ins.get(c)
            if v:
                self.cols[c][i] = int(v) % P
        for c in FLAG_COLS:
            if line.flag(c):
                self.cols[c][i] = 1
        for c, v in extra.items():
            if c in self.cols:
                self.cols[c][i] = int(v) % P
        self.cols["offset"][i] = line.offset % P
        self.cols["incStack"][i] = line.inc_stack % P
        self.cols["binOpcode"][i] = line.bin_opcode
        self.cols["jmpAddr"][i] = line.jmp_addr
        self.cols["elseAddr"][i] = line.else_addr
        for c, v in zip(CNT_COLS, ("arith", "binary", "mem_align",
                                   "keccak_f", "poseidon_g", "padding_pg")):
            self.cols[c][i] = getattr(extra["counters_pre"], v)
        self.row += 1

    def finalize_wrap(self, ctx) -> None:
        """The trace is cyclic: the reference writes every register's
        next-state to row (i+1) % N, so row 0 ends up holding the
        post-state of step N-1 (the ROM's end spin restores registers so
        the wrap stays consistent with the L1-gated identities)."""
        for r in REG8:
            vals = getattr(ctx, r)
            for j in range(8):
                self.cols[f"{r}{j}"][0] = vals[j]
        for r in SCALAR_REGS:
            self.cols[r][0] = getattr(ctx, r) % P
        if ctx.RCX % P:
            self.cols["RCXInv"][0] = pow(ctx.RCX % P, P - 2, P)
        for c, v in zip(CNT_COLS, ("arith", "binary", "mem_align",
                                   "keccak_f", "poseidon_g", "padding_pg")):
            self.cols[c][0] = getattr(ctx.counters, v)
        self.cols["zkPC"][0] = ctx.zkPC

    def matrix(self) -> np.ndarray:
        """(N, width) uint64 matrix in the recorder's column order."""
        return np.stack(list(self.cols.values()), axis=1)

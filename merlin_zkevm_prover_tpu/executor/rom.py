"""zkASM ROM loader (reference src/main_sm/fork_5/main/rom.cpp).

Reads the rom.json format produced by zkasmcom (keys: program / labels /
constants; per-line selector fields as observed in the reference fork_5
ROM) into typed RomLine records.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from ..ops.goldilocks import P

# in* selector fields contributing register limbs or scalars to op
IN_FIELDS = [
    "inA", "inB", "inC", "inD", "inE", "inSR", "inCTX", "inSP", "inPC",
    "inGAS", "inSTEP", "inRR", "inHASHPOS", "inRCX", "inROTL_C", "inFREE",
    "inCntArith", "inCntBinary", "inCntKeccakF", "inCntMemAlign",
    "inCntPaddingPG", "inCntPoseidonG",
]

FLAG_FIELDS = [
    "setA", "setB", "setC", "setD", "setE", "setSR", "setCTX", "setSP",
    "setPC", "setGAS", "setRR", "setHASHPOS", "setRCX",
    "JMP", "JMPN", "JMPC", "JMPZ", "call", "return", "repeat",
    "mOp", "mWR", "useCTX", "isStack", "isMem", "ind", "indRR",
    "useJmpAddr", "useElseAddr", "assert", "assumeFree",
    "sRD", "sWR", "arith", "arithEq0", "arithEq1", "arithEq2",
    "bin", "hashK", "hashK1", "hashKLen", "hashKDigest",
    "hashP", "hashP1", "hashPLen", "hashPDigest",
    "memAlignRD", "memAlignWR", "memAlignWR8",
]


@dataclass
class RomLine:
    index: int
    ins: Dict[str, int] = field(default_factory=dict)   # in* -> coef mod p
    flags: Dict[str, int] = field(default_factory=dict)
    const: Optional[int] = None       # CONST (field element, op0)
    constl: Optional[int] = None      # CONSTL (256-bit scalar)
    offset: int = 0
    offset_label: str = ""
    inc_stack: int = 0
    jmp_addr: int = 0
    else_addr: int = 0
    jmp_addr_label: str = ""
    else_addr_label: str = ""
    bin_opcode: int = 0
    free_in_tag: Optional[dict] = None
    cmd_before: Optional[list] = None
    cmd_after: Optional[list] = None
    line_str: str = ""
    file_name: str = ""
    line_no: int = 0

    def flag(self, name: str) -> int:
        return self.flags.get(name, 0)


@dataclass
class Rom:
    lines: List[RomLine]
    labels: Dict[str, int]
    constants: Dict[str, Any]

    def label(self, name: str) -> int:
        return int(self.labels[name])

    @property
    def size(self) -> int:
        return len(self.lines)


def _coef(v) -> int:
    return int(v) % P


def load_rom(source) -> Rom:
    """source: path or parsed dict in the reference rom.json format."""
    if isinstance(source, str):
        with open(source) as f:
            data = json.load(f)
    else:
        data = source

    lines: List[RomLine] = []
    for idx, raw in enumerate(data["program"]):
        rl = RomLine(index=idx)
        for k, v in raw.items():
            if k in IN_FIELDS:
                rl.ins[k] = _coef(v)
            elif k in FLAG_FIELDS:
                rl.flags[k] = int(v)
            elif k == "CONST":
                rl.const = int(v)
            elif k == "CONSTL":
                rl.constl = int(v)
            elif k == "offset":
                rl.offset = int(v)
            elif k == "offsetLabel":
                rl.offset_label = v
            elif k == "incStack":
                rl.inc_stack = int(v)
            elif k == "jmpAddr":
                rl.jmp_addr = int(v)
            elif k == "elseAddr":
                rl.else_addr = int(v)
            elif k == "jmpAddrLabel":
                rl.jmp_addr_label = v
            elif k == "elseAddrLabel":
                rl.else_addr_label = v
            elif k == "binOpcode":
                rl.bin_opcode = int(v)
            elif k == "freeInTag":
                rl.free_in_tag = v
            elif k == "cmdBefore":
                rl.cmd_before = v
            elif k == "cmdAfter":
                rl.cmd_after = v
            elif k == "lineStr":
                rl.line_str = v
            elif k == "fileName":
                rl.file_name = v
            elif k == "line":
                rl.line_no = int(v)
            # unknown fields are preserved as flags when integral
            elif isinstance(v, int):
                rl.flags[k] = v
        lines.append(rl)
    return Rom(
        lines=lines,
        labels={k: int(v) for k, v in data.get("labels", {}).items()},
        constants=data.get("constants", {}),
    )

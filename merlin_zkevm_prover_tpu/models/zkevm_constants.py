"""zkEVM constant-polynomial builders (the pil-stark buildConstants role).

The reference consumes prebuilt `zkevm.const` files (src/main.cpp:339-486;
generated offline by zkevm-proverjs).  This module rebuilds the constant
polynomials natively, parameterized by the domain size N so reduced-domain
proving works.  Sources of truth:

  * Rom.*      — compiled from the fork_5 rom.json program lines;
  * Storage.r* — compiled from storage_sm_rom.json (the SMT micro-ROM);
  * PoseidonG.C[12] — the Poseidon-GL round constants (31-row layout);
  * Bits2Field — FieldLatch/Factor exactly per the reference's documented
    layout (bits2field_executor.cpp header comment);
  * KeccakF    — gate types + connection wiring from the framework's own
    gate program (sm/keccak_f_script.py, the reference "script" role);
  * Global     — L1/LLAST/STEP/CLK32/BYTE/BYTE2 tables.

Where the exact zkevm-proverjs encoding is not pinned by the reference
repo (e.g. Rom.operations flag packing), the packing used here is
documented inline; it is consistent between this builder and any framework
component that consumes it.
"""

from __future__ import annotations

import functools
import json
from typing import Dict, List

import numpy as np

from ..executor.rom import IN_FIELDS, load_rom
from ..ops.goldilocks import P
from ..ops.poseidon_constants import ROUND_CONSTANTS, WIDTH

# Rom.operations flag packing order (bit i = flag i set on the line)
ROM_OPERATION_FLAGS = [
    "mOp", "mWR", "hashK", "hashK1", "hashKLen", "hashKDigest",
    "hashP", "hashP1", "hashPLen", "hashPDigest", "JMP", "JMPN", "JMPC",
    "JMPZ", "call", "return", "useJmpAddr", "useElseAddr", "setA", "setB",
    "setC", "setD", "setE", "setSR", "setCTX", "setSP", "setPC", "setGAS",
    "setRR", "setHASHPOS", "setRCX", "sRD", "sWR", "arithEq0", "arithEq1",
    "arithEq2", "memAlignRD", "memAlignWR", "memAlignWR8", "bin",
    "assert", "repeat", "ind", "indRR", "isStack", "isMem", "useCTX",
]

ROM_IN_COLS = [
    "inA", "inB", "inC", "inROTL_C", "inD", "inE", "inSR", "inFREE",
    "inCTX", "inSP", "inPC", "inGAS", "inHASHPOS", "inSTEP", "inRR",
    "inRCX", "inCntArith", "inCntBinary", "inCntKeccakF", "inCntMemAlign",
    "inCntPaddingPG", "inCntPoseidonG",
]


def global_constants(n: int) -> Dict[str, np.ndarray]:
    i = np.arange(n, dtype=np.uint64)
    out = {
        "Global.L1": (i == 0).astype(np.uint64),
        "Global.LLAST": (i == n - 1).astype(np.uint64),
        "Global.BYTE": i % 256,
        # second byte dimension: (BYTE_2A, BYTE) enumerates all byte
        # pairs over a 2^16 period (mem_align.pil:110 {inM[1], inM[0]},
        # binary.pil:86 freeInA/freeInB images)
        "Global.BYTE_2A": (i >> 8) % 256,
        "Global.BYTE2": i % 65536,
        "Global.STEP": i.copy(),
        "Global.STEP32": i % 32,
    }
    for k in range(32):
        out[f"Global.CLK32[{k}]"] = (i % 32 == k).astype(np.uint64)
    for k in range(8):
        out[f"Global.BYTE_FACTOR[{k}]"] = \
            np.full(n, 1 << (8 * (k % 4)), dtype=np.uint64)
    return out


def rom_constants(rom_path_or_dict, n: int) -> Dict[str, np.ndarray]:
    """Per-zkPC instruction constants (reference Rom.* namespace): the ROM
    program laid out at rows 0..size-1, zero elsewhere.  The Main SM's
    fetch is a plookup of (zkPC, instruction fields) into this table."""
    rom = load_rom(rom_path_or_dict) if isinstance(rom_path_or_dict, str) \
        else rom_path_or_dict
    size = rom.size
    assert size <= n, f"ROM ({size} lines) exceeds domain {n}"
    out: Dict[str, np.ndarray] = {}
    for j in range(8):
        out[f"Rom.CONST{j}"] = np.zeros(n, dtype=np.uint64)
    for c in ROM_IN_COLS + ["offset", "incStack", "binOpcode", "jmpAddr",
                            "elseAddr", "line", "operations"]:
        out[f"Rom.{c}"] = np.zeros(n, dtype=np.uint64)
    for i, line in enumerate(rom.lines):
        if line.constl is not None:
            for j in range(8):
                out[f"Rom.CONST{j}"][i] = (line.constl >> (32 * j)) & \
                    0xFFFFFFFF
        elif line.const is not None:
            out["Rom.CONST0"][i] = line.const % P
        for c in ROM_IN_COLS:
            v = line.ins.get(c)
            if v:
                out[f"Rom.{c}"][i] = int(v) % P
        out["Rom.offset"][i] = line.offset % P
        out["Rom.incStack"][i] = line.inc_stack % P
        out["Rom.binOpcode"][i] = line.bin_opcode
        out["Rom.jmpAddr"][i] = line.jmp_addr
        out["Rom.elseAddr"][i] = line.else_addr
        out["Rom.line"][i] = i
        ops = 0
        for b, flag in enumerate(ROM_OPERATION_FLAGS):
            if line.flag(flag):
                ops |= 1 << b
        out["Rom.operations"][i] = ops % P
    return out


def storage_constants(storage_rom_path: str, n: int) -> Dict[str, np.ndarray]:
    """The Storage SM micro-ROM compiled to r* constant columns (reference
    storage_sm_rom.json + storage_executor.cpp ROM fields)."""
    from ..executor.sm.storage_executor import load_storage_rom
    from ..hashdb.smt import scalar2fea

    rom = load_storage_rom(storage_rom_path)
    assert len(rom) <= n
    field_map = {
        "rHash": "i_hash", "rHashType": "i_hash_type",
        "rLatchGet": "i_latch_get", "rLatchSet": "i_latch_set",
        "rClimbRkey": "i_climb_rkey",
        "rClimbSiblingRkey": "i_climb_sibling_rkey",
        "rClimbSiblingRkeyN": "i_climb_sibling_rkey_n",
        "rRotateLevel": "i_rotate_level", "rJmpz": "i_jmpz",
        "rJmp": "i_jmp", "rAddress": "address",
        "rInFree": "in_free", "rInNewRoot": "in_new_root",
        "rInOldRoot": "in_old_root", "rInRkey": "in_rkey",
        "rInRkeyBit": "in_rkey_bit", "rInSiblingRkey": "in_sibling_rkey",
        "rInSiblingValueHash": "in_sibling_value_hash",
        "rInValueLow": "in_value_low", "rInValueHigh": "in_value_high",
        "rInRotlVh": "in_rotl_vh",
        "rSetHashLeft": "set_hash_left", "rSetHashRight": "set_hash_right",
        "rSetLevel": "set_level", "rSetNewRoot": "set_new_root",
        "rSetOldRoot": "set_old_root", "rSetRkey": "set_rkey",
        "rSetRkeyBit": "set_rkey_bit",
        "rSetSiblingRkey": "set_sibling_rkey",
        "rSetSiblingValueHash": "set_sibling_value_hash",
        "rSetValueHigh": "set_value_high", "rSetValueLow": "set_value_low",
    }
    out = {f"Storage.{nm}": np.zeros(n, dtype=np.uint64)
           for nm in list(field_map) + ["rConst0", "rConst1", "rConst2",
                                        "rConst3", "rLine"]}
    for i, line in enumerate(rom):
        for col, attr in field_map.items():
            v = int(getattr(line, attr))
            if v:
                out[f"Storage.{col}"][i] = v % P
        if line.const is not None:
            fea = scalar2fea(line.const % (1 << 256))
            for j in range(4):
                out[f"Storage.rConst{j}"][i] = fea[j]
        out["Storage.rLine"][i] = i
    return out


def poseidon_g_constants(n: int) -> Dict[str, np.ndarray]:
    """PoseidonG.C[12] round constants + LAST/LATCH/LASTBLOCK/PARTIAL
    selectors in the 31-rows-per-permutation layout (reference
    poseidon_g_executor.cpp:174-205)."""
    rows_per = 31
    out = {f"PoseidonG.C[{j}]": np.zeros(n, dtype=np.uint64)
           for j in range(WIDTH)}
    out["PoseidonG.LAST"] = np.zeros(n, dtype=np.uint64)
    out["PoseidonG.LATCH"] = np.zeros(n, dtype=np.uint64)
    out["PoseidonG.LASTBLOCK"] = np.zeros(n, dtype=np.uint64)
    out["PoseidonG.PARTIAL"] = np.zeros(n, dtype=np.uint64)
    full = (n // rows_per) * rows_per
    for i in range(n):
        if i >= full:
            # 31 does not divide 2^k: trailing rows are a dead zone —
            # LAST=1 gates off every transition constraint through the
            # domain wrap
            out["PoseidonG.LAST"][i] = 1
            continue
        r = i % rows_per
        if r < 30:
            for j in range(WIDTH):
                out[f"PoseidonG.C[{j}]"][i] = \
                    ROUND_CONSTANTS[r * WIDTH + j] % P
            if 4 <= r < 26:
                out["PoseidonG.PARTIAL"][i] = 1
        else:
            out["PoseidonG.LAST"][i] = 1
            out["PoseidonG.LASTBLOCK"][i] = 1
        out["PoseidonG.LATCH"][i] = 1 if r == 0 else 0
    return out


def bits2field_constants(n: int) -> Dict[str, np.ndarray]:
    """FieldLatch/Factor exactly per bits2field_executor.cpp:7-44."""
    factor = np.zeros(n, dtype=np.uint64)
    latch = np.zeros(n, dtype=np.uint64)
    for i in range(1, n):
        k = (i - 1) % 44
        factor[i] = 1 << k
        if k == 43:
            latch[i + 1 if i + 1 < n else 0] = 0  # latch marks completion
            latch[i] = 0
        if (i % 44) == 0:
            latch[i] = 1
    return {"Bits2Field.FieldLatch": latch, "Bits2Field.Factor": factor}


def keccak_f_constants(n: int) -> Dict[str, np.ndarray]:
    """Gate types and connection wiring from the framework's keccak-f gate
    program (reference KeccakF ConnA/ConnB/ConnC + GateType)."""
    from ..executor.sm.keccak_f_script import build_keccak_f_program
    from ..ops.goldilocks import w as gl_w

    prog = build_keccak_f_program()
    n_gates = len(prog.gates)
    assert n_gates + 1 <= n
    gate_type = np.zeros(n, dtype=np.uint64)
    for g, (op, _, _, _) in enumerate(prog.gates):
        gate_type[1 + g] = op
    # connection wiring: rows where the same wire appears (a/b/c pins)
    # are joined in one cycle, encoded exactly like the plonk sigma
    # (k_pin * w^row images)
    nbits = (n - 1).bit_length()
    assert (1 << nbits) == n
    wn = gl_w(nbits)
    xs = np.empty(n, dtype=np.uint64)
    cur = 1
    for r in range(n):
        xs[r] = cur
        cur = cur * wn % P
    ks = [1, 7, 49]  # pin cosets a/b/c
    conn = [np.array([(int(x) * k) % P for x in xs], dtype=np.uint64)
            for k in ks]
    wire_slots: Dict[int, List] = {}
    for g, (op, ia, ib, outw) in enumerate(prog.gates):
        row = 1 + g
        wire_slots.setdefault(ia, []).append((row, 0))
        wire_slots.setdefault(ib, []).append((row, 1))
        wire_slots.setdefault(outw, []).append((row, 2))
    for wid, slots in wire_slots.items():
        if len(slots) < 2:
            continue
        for i, (r, c) in enumerate(slots):
            r2, c2 = slots[(i + 1) % len(slots)]
            conn[c][r] = ks[c2] * int(xs[r2]) % P
    return {"KeccakF.GateType": gate_type, "KeccakF.ConnA": conn[0],
            "KeccakF.ConnB": conn[1], "KeccakF.ConnC": conn[2]}


def binary_constants(n: int) -> Dict[str, np.ndarray]:
    """The Binary SM tables (reference binary_executor.cpp byte semantics
    + buildFactors).

    Index mapping, pinned so (Global.BYTE_2A, Global.BYTE) carry the
    byte pair: i = opcode*2^18 + cin*2^17 + last*2^16 + a*2^8 + b.  The
    full table is 2^21 rows; at smaller domains a truncated prefix is
    produced (sufficient for polIdentity conformance; the plookup needs
    N >= 2^21).  FACTOR[j] places register j's two row-slots (factor 1
    then 2^16) in each 16-row block (buildFactors comment)."""
    idx = np.arange(n, dtype=np.uint64)
    out: Dict[str, np.ndarray] = {}
    reg = (idx // 2) % 8
    fval = np.where(idx % 2 == 0, np.uint64(1), np.uint64(1 << 16))
    for j in range(8):
        out[f"Binary.FACTOR[{j}]"] = np.where(reg == j, fval, np.uint64(0))

    m = min(n, 1 << 21)
    i = np.arange(m, dtype=np.int64)
    b = i & 0xFF
    a = (i >> 8) & 0xFF
    last = (i >> 16) & 1
    cin = (i >> 17) & 1
    opcode = i >> 18
    c = np.zeros(m, dtype=np.int64)
    cout = np.zeros(m, dtype=np.int64)
    use = np.zeros(m, dtype=np.int64)
    lt_chain = np.where(a < b, 1, np.where(a == b, cin, 0))
    for o in range(8):
        s = opcode == o
        if o == 0:                          # ADD
            tot = a + b + cin
            c[s] = (tot & 0xFF)[s]
            cout[s] = (tot >> 8)[s]
        elif o == 1:                        # SUB
            d = a - cin - b
            c[s] = (d & 0xFF)[s]
            cout[s] = (d < 0)[s]
        elif o == 2:                        # LT
            cout[s] = lt_chain[s]
            c[s] = np.where(last, lt_chain, 0)[s]
            use[s] = last[s]
        elif o == 3:                        # SLT (sign at last byte)
            sa, sb = a >> 7, b >> 7
            sign = np.where(sa > sb, 1, np.where(sa < sb, 0, lt_chain))
            cc = np.where(last, sign, lt_chain)
            cout[s] = cc[s]
            c[s] = np.where(last, cc, 0)[s]
            use[s] = last[s]
        elif o == 4:                        # EQ (carry = "differ so far")
            raw = np.where((a == b) & (cin == 0), 0, 1)
            cc = np.where(last, 1 - raw, raw)
            cout[s] = cc[s]
            c[s] = np.where(last, cc, 0)[s]
            use[s] = last[s]
        elif o == 5:                        # AND (carry = "any nonzero")
            cb = a & b
            c[s] = cb[s]
            cout[s] = np.where((cb == 0) & (cin == 0), 0, 1)[s]
        elif o == 6:                        # OR
            c[s] = (a | b)[s]
        else:                               # XOR
            c[s] = (a ^ b)[s]

    def col(v):
        full = np.zeros(n, dtype=np.uint64)
        full[:m] = v.astype(np.uint64)
        return full

    out.update({
        "Binary.P_OPCODE": col(opcode), "Binary.P_CIN": col(cin),
        "Binary.P_LAST": col(last), "Binary.P_C": col(c),
        "Binary.P_COUT": col(cout), "Binary.P_USE_CARRY": col(use),
    })
    return out


def build_all(n: int,
              rom_path: str =
              "/root/reference/src/main_sm/fork_5/scripts/rom.json",
              storage_rom_path: str =
              "/root/reference/src/main_sm/fork_5/scripts/"
              "storage_sm_rom.json") -> Dict[str, np.ndarray]:
    """Every constant namespace this builder covers, keyed by PIL name."""
    out = {}
    out.update(global_constants(n))
    try:
        out.update(rom_constants(rom_path, n))
    except (FileNotFoundError, AssertionError):
        pass
    try:
        out.update(storage_constants(storage_rom_path, n))
    except (FileNotFoundError, AssertionError):
        pass
    out.update(poseidon_g_constants(n))
    out.update(bits2field_constants(n))
    out.update(binary_constants(n))
    if n >= (1 << 18):
        out.update(keccak_f_constants(n))
    return out

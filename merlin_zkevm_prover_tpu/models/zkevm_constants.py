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
        "Global.BYTE_2A": (i % 256) * 2,       # doubled-byte helper table
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
    """The Binary SM byte-operation lookup table: rows enumerate
    (opcode, cin, last, a_byte, b_byte) -> (c_byte, cout, useCarry)
    (reference binary_executor.cpp FACTOR/P_* tables).  The full table is
    2^21 rows; at smaller domains a truncated prefix is produced."""
    p_opcode = np.zeros(n, dtype=np.uint64)
    p_a = np.zeros(n, dtype=np.uint64)
    p_b = np.zeros(n, dtype=np.uint64)
    p_cin = np.zeros(n, dtype=np.uint64)
    p_last = np.zeros(n, dtype=np.uint64)
    p_c = np.zeros(n, dtype=np.uint64)
    p_cout = np.zeros(n, dtype=np.uint64)
    p_use_carry = np.zeros(n, dtype=np.uint64)
    i = 0
    for opcode in range(8):
        for cin in range(2):
            for last in range(2):
                for a in range(256):
                    for b in range(256):
                        if i >= n:
                            return {
                                "Binary.P_OPCODE": p_opcode,
                                "Binary.P_A": p_a, "Binary.P_B": p_b,
                                "Binary.P_CIN": p_cin,
                                "Binary.P_LAST": p_last,
                                "Binary.P_C": p_c,
                                "Binary.P_COUT": p_cout,
                                "Binary.P_USE_CARRY": p_use_carry,
                            }
                        c, cout, use = _binary_byte(opcode, cin, last, a, b)
                        p_opcode[i] = opcode
                        p_a[i] = a
                        p_b[i] = b
                        p_cin[i] = cin
                        p_last[i] = last
                        p_c[i] = c
                        p_cout[i] = cout
                        p_use_carry[i] = use
                        i += 1
    return {
        "Binary.P_OPCODE": p_opcode, "Binary.P_A": p_a, "Binary.P_B": p_b,
        "Binary.P_CIN": p_cin, "Binary.P_LAST": p_last, "Binary.P_C": p_c,
        "Binary.P_COUT": p_cout, "Binary.P_USE_CARRY": p_use_carry,
    }


def _binary_byte(opcode, cin, last, a, b):
    """Byte-level op semantics (reference binary_executor.cpp:31-60)."""
    if opcode == 0:      # ADD
        s = a + b + cin
        return s & 0xFF, s >> 8, 0
    if opcode == 1:      # SUB
        d = a - b - cin
        return d & 0xFF, 1 if d < 0 else 0, 0
    if opcode == 2:      # LT (bytes LSB->MSB; cin = "less so far")
        cout = 1 if a < b else (cin if a == b else 0)
        return (cout if last else 0), cout, (1 if last else 0)
    if opcode == 3:      # SLT (sign compared at the top byte)
        if last:
            sa, sb = a ^ 0x80, b ^ 0x80
            cout = 1 if sa < sb else (cin if sa == sb else 0)
            return cout, cout, 1
        return _binary_byte(2, cin, 0, a, b)
    if opcode == 4:      # EQ (cin starts 1: "equal so far")
        cout = 1 if (a == b and cin) else 0
        return (cout if last else 0), cout, (1 if last else 0)
    if opcode == 5:      # AND
        c = a & b
        return c, 1 if (cin or c != 0) else 0, 0
    if opcode == 6:      # OR
        return a | b, 0, 0
    if opcode == 7:      # XOR
        return a ^ b, 0, 0
    raise ValueError(opcode)


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

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

# Rom.operations flag packing order (bit i = flag i set on the line).
# This is the PIL's own coefficient assignment in the Main->Rom fetch
# plookup (main.pil:513 `operations` compression: 1*arithEq0 + 2*arithEq1
# + ... + 2^46*useElseAddr) — it must match bit-exactly or every fetch
# row misses the table.
ROM_OPERATION_FLAGS = [
    "arithEq0", "arithEq1", "arithEq2", "assert", "bin", "hashK",
    "hashKDigest", "hashKLen", "hashP", "hashPDigest", "hashPLen",
    "ind", "indRR", "isMem", "isStack", "JMP", "JMPC", "JMPN",
    "memAlignRD", "memAlignWR", "memAlignWR8", "mOp", "mWR", "repeat",
    "setA", "setB", "setC", "setCTX", "setD", "setE", "setGAS",
    "setHASHPOS", "setPC", "setRCX", "setRR", "setSP", "setSR",
    "sRD", "sWR", "useCTX", "useJmpAddr", "JMPZ", "call", "return",
    "hashK1", "hashP1", "useElseAddr",
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
    # BYTE_FACTOR[k] at offset o (= STEP32): the packing factor of byte o
    # into felt o//4 of an 8x32-bit value (pairs with the padding SMs'
    # crOffset/crF plookups)
    for k in range(8):
        o = i % 32
        out[f"Global.BYTE_FACTOR[{k}]"] = np.where(
            o // 4 == k,
            np.uint64(1) << (np.uint64(8) * (o % 4)), np.uint64(0))
    return out


def arith_constants(n: int) -> Dict[str, np.ndarray]:
    """Arith range tables (arith.pil:252,1916-1918 lookups).

    (SEL_BYTE2_BIT19, BYTE2_BIT19) is a tagged range table: rows i<2^16
    carry (0, i) — plain 16-bit limbs — and the next 2^19 rows carry
    (1, i-2^16) for the wider top limbs of the q quotients (q < 2^258
    leaves up to 19 bits in the last limb, selected on CLK32 29..31).
    GL_SIGNED_22BITS covers the eq carry range as signed values
    (i - 2^22) mod p.  Both need the full 2^23 domain to be complete;
    reduced domains get the same prefix and rely on trace-covering
    compaction (models/zkevm.py) for the tail."""
    i = np.arange(n, dtype=np.uint64)
    sel = ((i >= (1 << 16)) & (i < (1 << 16) + (1 << 19))).astype(np.uint64)
    b19 = np.where(i < (1 << 16), i,
                   np.where(sel == 1, i - (1 << 16), 0)).astype(np.uint64)
    signed = ((i.astype(object) - (1 << 22)) % P).astype(np.uint64) \
        if n >= (1 << 22) else \
        ((i.astype(object) - n // 2) % P).astype(np.uint64)
    return {
        "Arith.SEL_BYTE2_BIT19": sel,
        "Arith.BYTE2_BIT19": b19,
        "Arith.GL_SIGNED_22BITS": signed,
    }


def padding_pg_constants(n: int) -> Dict[str, np.ndarray]:
    """PaddingPG.F[8] byte-packing factors (7 bytes per felt, 8 felts per
    56-byte block), lastBlock at block-final rows, crValid (chunk-read
    latch rows allowed everywhere)."""
    i = np.arange(n, dtype=np.uint64)
    out: Dict[str, np.ndarray] = {}
    blk = i % 56
    elem = blk // 7
    sh = np.uint64(8) * (blk % 7)
    for k in range(8):
        out[f"PaddingPG.F[{k}]"] = np.where(elem == k, np.uint64(1) << sh,
                                            np.uint64(0))
    last = (blk == 55).astype(np.uint64)
    # 2^k is not a multiple of 56: the domain ends in a short block whose
    # last row plays the byte-55 role (padding_pg_executor.cpp tail:
    # freeIn 0x80 + lastHash close the cycle at row N-1)
    short = 56 * (n // 56)
    if short < n:
        last[short:] = 0
        last[n - 1] = 1
        for k in range(8):
            out[f"PaddingPG.F[{k}]"][short:] = 0
        out["PaddingPG.F[0]"][short] = 1
        out["PaddingPG.F[7]"][n - 1] = np.uint64(1) << np.uint64(48)
    out["PaddingPG.lastBlock"] = last
    out["PaddingPG.crValid"] = np.ones(n, dtype=np.uint64)
    return out


def rom_constants(rom_path_or_dict, n: int) -> Dict[str, np.ndarray]:
    """Per-zkPC instruction constants (reference Rom.* namespace): the ROM
    program laid out at rows 0..size-1, zero elsewhere.  The Main SM's
    fetch is a plookup of (zkPC, instruction fields) into this table."""
    rom = rom_path_or_dict if hasattr(rom_path_or_dict, "lines") \
        else load_rom(rom_path_or_dict)
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
    """FieldLatch/Factor per bits2field_executor.cpp:7-44, aligned with
    the keccak gate-script slots: within slot s, rows s*S+1 .. s*S+140801
    carry the 3200x44 bit lattice; FieldLatch=1 every 44th row (word
    completion = the KeccakF Sin/Sout row), Factor = 1<<((q-1)%44)."""
    from ..executor.sm.keccak_layout import build_keccak_script, n_slots

    S = build_keccak_script().slot_size
    factor = np.zeros(n, dtype=np.uint64)
    latch = np.zeros(n, dtype=np.uint64)
    region = 3200 * 44 + 1
    q = np.arange(1, region + 1, dtype=np.uint64)
    f_slot = np.uint64(1) << ((q - 1) % 44)
    l_slot = (((q - 1) % 44 == 0) & (q > 1)).astype(np.uint64)
    for s in range(n_slots(n)):
        base = s * S
        factor[base + 1: base + region + 1] = f_slot
        latch[base + 1: base + region + 1] = l_slot
    return {"Bits2Field.FieldLatch": latch, "Bits2Field.Factor": factor}


def keccak_f_constants(n: int) -> Dict[str, np.ndarray]:
    """GateType/ConnA/ConnB/ConnC + kGateType/kA/kB/kC from the
    row-allocated gate script (executor/sm/keccak_layout.py)."""
    from ..executor.sm.keccak_layout import keccak_f_constants as kfc

    return kfc(n, P)


def padding_kk_constants(n: int) -> Dict[str, np.ndarray]:
    """PaddingKK r8Id/sOutId/lastBlock/lastBlockLatch/r8valid/
    forceLastHash: 136-byte block structure over 44*n_slots blocks, a
    structureless tail, and lastBlock forced at row N-1 so the cyclic
    wrap closes (padding_kk.pil:86 addr carry)."""
    from ..executor.sm.keccak_layout import n_slots

    blocks = 44 * n_slots(n)
    region = 136 * blocks
    i = np.arange(n, dtype=np.uint64)
    in_region = i < region
    last = in_region & (i % 136 == 135)
    out = {
        "PaddingKK.lastBlockLatch": last.astype(np.uint64),
        "PaddingKK.lastBlock": (last | (i == n - 1)).astype(np.uint64),
        "PaddingKK.r8valid": in_region.astype(np.uint64),
        "PaddingKK.r8Id": np.where(in_region, i + 1, 0).astype(np.uint64),
        "PaddingKK.sOutId": np.where(last, (i // 136) + 1,
                                     0).astype(np.uint64),
        "PaddingKK.forceLastHash": np.zeros(n, dtype=np.uint64),
    }
    if region:
        # the final structured block must terminate its stream
        out["PaddingKK.forceLastHash"][region - 1] = 1
    return out


def padding_kkbit_constants(n: int) -> Dict[str, np.ndarray]:
    """PaddingKKBit slot constants (1993-row slots: 136 x 9 absorb rows,
    512 capacity rows, 256 sOut rows, 1 final row) + the three-column
    connection constants tying sOutBit/sInBit to Bits2Field.bit."""
    from ..executor.sm.keccak_layout import build_keccak_script, n_slots
    from ..executor.sm.keccak_pipeline import KKBIT_SLOT
    from ..ops.goldilocks import w as gl_w

    slots = 44 * n_slots(n)
    out = {c: np.zeros(n, dtype=np.uint64) for c in
           ["PaddingKKBit.r8Id", "PaddingKKBit.sOutId",
            "PaddingKKBit.latchR8", "PaddingKKBit.Fr8",
            "PaddingKKBit.rBitValid", "PaddingKKBit.latchSOut"]
           + [f"PaddingKKBit.FSOut{k}" for k in range(8)]}
    for s in range(slots):
        base = s * KKBIT_SLOT
        for j in range(136):
            for k in range(8):
                r = base + j * 9 + k
                out["PaddingKKBit.Fr8"][r] = 1 << k
                out["PaddingKKBit.rBitValid"][r] = 1
            out["PaddingKKBit.latchR8"][base + j * 9 + 8] = 1
            out["PaddingKKBit.r8Id"][base + j * 9 + 8] = s * 136 + j + 1
        for j in range(256):
            r = base + 136 * 9 + 512 + j
            byte = j // 8
            chunk = 7 - byte // 4
            sh = (3 - byte % 4) * 8 + j % 8
            out[f"PaddingKKBit.FSOut{chunk}"][r] = 1 << sh
        out["PaddingKKBit.latchSOut"][base + KKBIT_SLOT - 1] = 1
        out["PaddingKKBit.sOutId"][base + KKBIT_SLOT - 1] = s + 1

    # ---- ConnSOutBit / ConnSInBit / ConnBits2FieldBit ----
    S = build_keccak_script().slot_size
    nbits = (n - 1).bit_length()
    assert (1 << nbits) == n
    wn = gl_w(nbits)
    xs = np.empty(n, dtype=np.uint64)
    cur = 1
    for r in range(n):
        xs[r] = cur
        cur = cur * wn % P
    ks = [1, 7, 49]  # column cosets: sOutBit, sInBit, bit
    conn = [(xs.astype(object) * k % P).astype(np.uint64) for k in ks]

    def rotate(pins):
        if len(pins) < 2:
            return
        for idx, (r, c) in enumerate(pins):
            r2, c2 = pins[(idx + 1) % len(pins)]
            conn[c][r] = ks[c2] * int(xs[r2]) % P

    def absorb_row(slot, b):
        if b < 1088:
            return slot * KKBIT_SLOT + (b // 8) * 9 + b % 8
        return slot * KKBIT_SLOT + 136 * 9 + (b - 1088)

    for s in range(slots):
        ksl, lane = divmod(s, 44)
        for b in range(1600):
            b2f_in = ksl * S + 1 + b * 44 + lane
            # input bit: Bits2Field.bit == sInBit at the absorb row
            rotate([(absorb_row(s, b), 1), (b2f_in, 2)])
            # output bit: Bits2Field.bit == sOutBit in the next slot's
            # absorb region (the chained state) and, for the first 256
            # bits, the sOut accumulate rows of this slot
            b2f_out = ksl * S + 1 + (1600 + b) * 44 + lane
            pins = [(absorb_row((s + 1) % slots, b), 0), (b2f_out, 2)]
            if b < 256:
                pins.append((s * KKBIT_SLOT + 136 * 9 + 512 + b, 0))
            rotate(pins)
    out["PaddingKKBit.ConnSOutBit"] = conn[0]
    out["PaddingKKBit.ConnSInBit"] = conn[1]
    out["PaddingKKBit.ConnBits2FieldBit"] = conn[2]
    return out


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
    out.update(arith_constants(n))
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
    out.update(padding_pg_constants(n))
    out.update(padding_kk_constants(n))
    out.update(padding_kkbit_constants(n))
    out.update(keccak_f_constants(n))
    return out

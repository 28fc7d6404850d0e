"""Storage SM micro-ROM executor (reference src/sm/storage/
storage_executor.cpp:1-1239 + storage_sm_rom.json).

Executes the 392-line SMT micro-ROM once per SMT action (the Main SM's
sRD/sWR results): the ROM walks the recorded key bits down, rehashes the
climb through the recorded siblings, and latches against the action's
roots/key/value.  Fills the real Storage.* committed columns — registers
(rkey/valueLow/valueHigh/level/oldRoot/newRoot/hashLeft/hashRight/
siblingRkey/siblingValueHash/rkeyBit/incCounter/pc), per-row selector and
instruction flags, free inputs and op0inv — and emits one PoseidonG work
item per iHash row.

The per-action context (level/bits/currentLevel) mirrors the reference
SmtActionContext (smt_action_context.cpp:1-135): bits come from shifting
the interleaved key registers, except for insertFound/deleteFound where
they are recomputed by comparing key and insKey up to divergence.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ... import native
from ...hashdb.smt import scalar2fea
from ...ops.goldilocks import P

DEFAULT_ROM = ("/root/reference/src/main_sm/fork_5/scripts/"
               "storage_sm_rom.json")

_REGISTERS = (
    [f"rkey{i}" for i in range(4)]
    + [f"valueLow{i}" for i in range(4)]
    + [f"valueHigh{i}" for i in range(4)]
    + [f"level{i}" for i in range(4)]
    + [f"oldRoot{i}" for i in range(4)]
    + [f"newRoot{i}" for i in range(4)]
    + [f"hashLeft{i}" for i in range(4)]
    + [f"hashRight{i}" for i in range(4)]
    + [f"siblingRkey{i}" for i in range(4)]
    + [f"siblingValueHash{i}" for i in range(4)]
    + ["rkeyBit", "incCounter", "pc"]
)

_FLAGS = [
    "inFree", "inOldRoot", "inNewRoot", "inValueLow", "inValueHigh",
    "inSiblingValueHash", "inRkey", "inRkeyBit", "inSiblingRkey",
    "inRotlVh", "setHashLeft", "setHashRight", "setOldRoot", "setNewRoot",
    "setValueLow", "setValueHigh", "setSiblingValueHash", "setRkey",
    "setSiblingRkey", "setRkeyBit", "setLevel", "iHash", "iHashType",
    "iLatchSet", "iLatchGet", "iClimbRkey", "iClimbSiblingRkey",
    "iClimbSiblingRkeyN", "iRotateLevel", "iJmpz", "iJmp", "iAddress",
    "op0inv",
]


@dataclass
class StorageRomLine:
    i_jmpz: bool = False
    i_jmp: bool = False
    i_rotate_level: bool = False
    i_hash: bool = False
    i_hash_type: int = 0
    i_climb_rkey: bool = False
    i_climb_sibling_rkey: bool = False
    i_climb_sibling_rkey_n: bool = False
    i_latch_get: bool = False
    i_latch_set: bool = False
    in_free: bool = False
    in_old_root: bool = False
    in_new_root: bool = False
    in_rkey_bit: bool = False
    in_value_low: bool = False
    in_value_high: bool = False
    in_rkey: bool = False
    in_sibling_rkey: bool = False
    in_sibling_value_hash: bool = False
    in_rotl_vh: bool = False
    set_rkey: bool = False
    set_rkey_bit: bool = False
    set_value_low: bool = False
    set_value_high: bool = False
    set_level: bool = False
    set_old_root: bool = False
    set_new_root: bool = False
    set_hash_left: bool = False
    set_hash_right: bool = False
    set_sibling_rkey: bool = False
    set_sibling_value_hash: bool = False
    address: int = 0
    op: str = ""
    func_name: str = ""
    params: List[int] = field(default_factory=list)
    const: Optional[int] = None


def load_storage_rom(path: str = DEFAULT_ROM) -> List[StorageRomLine]:
    prog = json.load(open(path))["program"]
    lines = []
    for j in prog:
        ln = StorageRomLine(
            i_jmpz="iJmpz" in j, i_jmp="iJmp" in j,
            i_rotate_level="iRotateLevel" in j, i_hash="iHash" in j,
            i_hash_type=int(j.get("iHashType", 0)),
            i_climb_rkey="iClimbRkey" in j,
            i_climb_sibling_rkey="iClimbSiblingRkey" in j,
            i_climb_sibling_rkey_n="iClimbSiblingRkeyN" in j,
            i_latch_get="iLatchGet" in j, i_latch_set="iLatchSet" in j,
            in_free="inFREE" in j, in_old_root="inOLD_ROOT" in j,
            in_new_root="inNEW_ROOT" in j, in_rkey_bit="inRKEY_BIT" in j,
            in_value_low="inVALUE_LOW" in j,
            in_value_high="inVALUE_HIGH" in j, in_rkey="inRKEY" in j,
            in_sibling_rkey="inSIBLING_RKEY" in j,
            in_sibling_value_hash="inSIBLING_VALUE_HASH" in j,
            in_rotl_vh="inROTL_VH" in j,
            set_rkey="setRKEY" in j, set_rkey_bit="setRKEY_BIT" in j,
            set_value_low="setVALUE_LOW" in j,
            set_value_high="setVALUE_HIGH" in j,
            set_level="setLEVEL" in j, set_old_root="setOLD_ROOT" in j,
            set_new_root="setNEW_ROOT" in j,
            set_hash_left="setHASH_LEFT" in j,
            set_hash_right="setHASH_RIGHT" in j,
            set_sibling_rkey="setSIBLING_RKEY" in j,
            set_sibling_value_hash="setSIBLING_VALUE_HASH" in j,
            address=int(j.get("address", 0)),
            const=int(j["CONST"]) if "CONST" in j else None,
        )
        if ln.in_free:
            tag = j["freeInTag"]
            ln.op = tag.get("op", "")
            if ln.op == "functionCall":
                ln.func_name = tag["funcName"]
                ln.params = [int(p["num"]) for p in tag.get("params", [])]
        lines.append(ln)
    return lines


class _ActionContext:
    """Reference SmtActionContext (smt_action_context.cpp)."""

    def __init__(self, act):
        if act.b_is_set:
            key, sibling_key = act.key, act.ins_key
            mode = act.mode
        else:
            key, sibling_key = act.key, act.ins_key
            mode = ""
        self.level = len(act.siblings)
        r_key = list(key)
        s_key = list(sibling_key)
        self.bits: List[int] = []
        self.sibling_bits: List[int] = []
        if act.b_is_set and mode in ("insertFound", "deleteFound"):
            for i in range(256):
                j = i % 4
                bit = r_key[j] & 1
                sbit = s_key[j] & 1
                r_key[j] >>= 1
                s_key[j] >>= 1
                self.bits.append(bit)
                self.sibling_bits.append(sbit)
                if bit != sbit:
                    break
            self.level = len(self.bits)
        else:
            for i in range(self.level):
                j = i % 4
                self.bits.append(r_key[j] & 1)
                self.sibling_bits.append(s_key[j] & 1)
                r_key[j] >>= 1
                s_key[j] >>= 1
        self.r_key = tuple(r_key)
        self.sibling_r_key = tuple(s_key)
        self.current_level = self.level


class StorageExecutor:
    """Micro-ROM interpreter over SMT actions."""

    COLUMNS = [f"free{i}" for i in range(4)] + _REGISTERS + _FLAGS \
        + [f"iConst{i}" for i in range(4)]

    def __init__(self, rom_path: str = DEFAULT_ROM):
        self._rom_path = rom_path
        self._rom: Optional[List[StorageRomLine]] = None

    @property
    def rom(self) -> List[StorageRomLine]:
        if self._rom is None:
            self._rom = load_storage_rom(self._rom_path)
        return self._rom

    def execute(self, actions: List, n: int,
                required_poseidon: Optional[List[list]] = None,
                hashdb=None) -> Dict[str, np.ndarray]:
        """actions: SmtSetResult/SmtGetResult objects in Main SM order."""
        rom = self.rom
        pols: Dict[str, np.ndarray] = {
            c: np.zeros(n, dtype=np.uint64) for c in self.COLUMNS}

        a = 0
        empty = len(actions) == 0
        ctx = _ActionContext(actions[0]) if not empty else None
        last_step = 0
        i = 0
        while i < n:
            nexti = (i + 1) % n
            l = int(pols["pc"][i])
            line = rom[l]
            op = [0, 0, 0, 0]

            # idle fast path: the end-polynomial wait self-loop
            if empty and line.i_jmpz and line.address == l and \
                    line.func_name == "isAlmostEndPolynomial" and i < n - 2:
                if last_step == 0:
                    last_step = i
                j = n - 2  # rows [i, j) are identical wait rows
                pols["inFree"][i:j] = 1
                pols["iJmpz"][i:j] = 1
                pols["iAddress"][i:j] = l
                pols["pc"][i + 1:j + 1] = l
                for c in _REGISTERS[:-1]:
                    v = pols[c][i]
                    if v:
                        pols[c][i + 1:j + 1] = v
                i = j
                continue

            act = actions[a] if not empty else None

            # ---- free input ----
            if line.in_free:
                if line.op == "functionCall":
                    op = self._func(line, act, ctx, empty, i, n)
                    if line.func_name == "isAlmostEndPolynomial" \
                            and last_step == 0:
                        last_step = i
                    for j in range(4):
                        if op[j]:
                            pols[f"free{j}"][i] = op[j]
                pols["inFree"][i] = 1

            # ---- constant ----
            if line.const is not None:
                fea = scalar2fea(line.const % (1 << 256))
                op = fea[0:4]
                for j in range(4):
                    pols[f"iConst{j}"][i] = op[j]

            # ---- register selectors (assignments: the ROM never mixes) --
            for flag, cols, pcol in (
                (line.in_old_root, [f"oldRoot{j}" for j in range(4)],
                 "inOldRoot"),
                (line.in_new_root, [f"newRoot{j}" for j in range(4)],
                 "inNewRoot"),
                (line.in_value_low, [f"valueLow{j}" for j in range(4)],
                 "inValueLow"),
                (line.in_value_high, [f"valueHigh{j}" for j in range(4)],
                 "inValueHigh"),
                (line.in_rkey, [f"rkey{j}" for j in range(4)], "inRkey"),
                (line.in_sibling_rkey,
                 [f"siblingRkey{j}" for j in range(4)], "inSiblingRkey"),
                (line.in_sibling_value_hash,
                 [f"siblingValueHash{j}" for j in range(4)],
                 "inSiblingValueHash"),
            ):
                if flag:
                    op = [int(pols[c][i]) for c in cols]
                    pols[pcol][i] = 1
            if line.in_rkey_bit:
                op = [int(pols["rkeyBit"][i]), 0, 0, 0]
                pols["inRkeyBit"][i] = 1
            if line.in_rotl_vh:
                vh = [int(pols[f"valueHigh{j}"][i]) for j in range(4)]
                op = [vh[3], vh[0], vh[1], vh[2]]
                pols["inRotlVh"][i] = 1

            # ---- jumps ----
            if line.i_jmpz:
                pols["pc"][nexti] = line.address if op[0] == 0 else l + 1
                pols["iAddress"][i] = line.address
                pols["iJmpz"][i] = 1
            elif line.i_jmp:
                pols["pc"][nexti] = line.address
                pols["iAddress"][i] = line.address
                pols["iJmp"][i] = 1
            else:
                pols["pc"][nexti] = l + 1

            # ---- level rotation ----
            if line.i_rotate_level:
                lv = [int(pols[f"level{j}"][i]) for j in range(4)]
                pols["level0"][nexti] = lv[1]
                pols["level1"][nexti] = lv[2]
                pols["level2"][nexti] = lv[3]
                pols["level3"][nexti] = lv[0]
                pols["iRotateLevel"][i] = 1

            # ---- hash ----
            if line.i_hash:
                fea = [int(pols[f"hashLeft{j}"][i]) for j in range(4)] \
                    + [int(pols[f"hashRight{j}"][i]) for j in range(4)] \
                    + [0, 0, 0, 0]
                if line.i_hash_type == 1:
                    fea[8] = 1
                    pols["iHashType"][i] = 1
                h = native.poseidon_permute(fea)[:4]
                for j in range(4):
                    pols[f"free{j}"][i] = h[j]
                    op[j] = (op[j] + h[j]) % P  # op += inFREE * hash
                pols["iHash"][i] = 1
                if required_poseidon is not None:
                    # tag 3 = storage permutation (poseidon_g_permutation.hpp)
                    required_poseidon.append(list(fea) + list(h) + [3])

            # ---- climbs ----
            bit = int(pols["rkeyBit"][i])
            if line.i_climb_rkey:
                self._climb(pols, i, nexti, "rkey", bit)
                pols["iClimbRkey"][i] = 1
            if line.i_climb_sibling_rkey:
                self._climb(pols, i, nexti, "siblingRkey", bit)
                pols["iClimbSiblingRkey"][i] = 1
            if line.i_climb_sibling_rkey_n:
                self._climb(pols, i, nexti, "siblingRkey", 1 - bit)
                pols["iClimbSiblingRkeyN"][i] = 1

            # ---- latches: verify against the action, advance ----
            if line.i_latch_get or line.i_latch_set:
                self._latch(pols, i, act, line.i_latch_set)
                pols["iLatchSet" if line.i_latch_set else "iLatchGet"][i] = 1
                a += 1
                if a >= len(actions):
                    empty = True
                else:
                    ctx = _ActionContext(actions[a])

            # ---- setters (default: carry) ----
            for flag, base, pcol in (
                (line.set_rkey, "rkey", "setRkey"),
                (line.set_value_low, "valueLow", "setValueLow"),
                (line.set_value_high, "valueHigh", "setValueHigh"),
                (line.set_level, "level", "setLevel"),
                (line.set_old_root, "oldRoot", "setOldRoot"),
                (line.set_new_root, "newRoot", "setNewRoot"),
                (line.set_hash_left, "hashLeft", "setHashLeft"),
                (line.set_hash_right, "hashRight", "setHashRight"),
                (line.set_sibling_rkey, "siblingRkey", "setSiblingRkey"),
                (line.set_sibling_value_hash, "siblingValueHash",
                 "setSiblingValueHash"),
            ):
                if flag:
                    for j in range(4):
                        pols[f"{base}{j}"][nexti] = op[j]
                    pols[pcol][i] = 1
                elif not (
                    (base == "rkey" and line.i_climb_rkey)
                    or (base == "level" and line.i_rotate_level)
                    or (base == "siblingRkey"
                        and (line.i_climb_sibling_rkey
                             or line.i_climb_sibling_rkey_n))
                ):
                    for j in range(4):
                        pols[f"{base}{j}"][nexti] = pols[f"{base}{j}"][i]
            if line.set_rkey_bit:
                pols["rkeyBit"][nexti] = op[0]
                pols["setRkeyBit"][i] = 1
            else:
                pols["rkeyBit"][nexti] = pols["rkeyBit"][i]

            if op[0]:
                pols["op0inv"][i] = pow(op[0], P - 2, P)

            if line.i_hash:
                pols["incCounter"][nexti] = (int(pols["incCounter"][i]) + 1)
            elif line.i_latch_get or line.i_latch_set:
                pols["incCounter"][nexti] = 0
            else:
                pols["incCounter"][nexti] = pols["incCounter"][i]

            i += 1

        if last_step == 0:
            raise ValueError(
                "storage micro-ROM did not reach isAlmostEndPolynomial "
                f"({len(actions)} actions do not fit in {n} rows)")
        return pols

    @staticmethod
    def _climb(pols, i, nexti, base: str, bit: int) -> None:
        """Shift `bit` into the register selected by the level one-hot."""
        for j in range(4):
            v = int(pols[f"{base}{j}"][i])
            if int(pols[f"level{j}"][i]) == 1:
                v = (v << 1) + bit
            pols[f"{base}{j}"][nexti] = v

    def _func(self, line, act, ctx: Optional[_ActionContext], empty: bool,
              i: int, n: int) -> List[int]:
        fn = line.func_name
        op = [0, 0, 0, 0]
        if fn == "isGet":
            if not empty and not act.b_is_set:
                op[0] = 1
        elif fn.startswith("isSet"):
            mode = fn[len("isSet"):]
            mode = mode[0].lower() + mode[1:]
            if not empty and act.b_is_set and act.mode == mode:
                op[0] = 1
        elif fn == "GetIsOld0":
            if not empty and act.is_old0:
                op[0] = 1
        elif fn == "GetRkey":
            op = list(ctx.r_key)
        elif fn == "GetSiblingRkey":
            op = list(ctx.sibling_r_key)
        elif fn == "GetSiblingHash":
            sib = act.siblings[ctx.current_level]
            side = 1 - ctx.bits[ctx.current_level]
            op = list(sib[side * 4: side * 4 + 4])
        elif fn == "GetValueLow":
            v = act.new_value if act.b_is_set else act.value
            op = scalar2fea(v)[0:4]
        elif fn == "GetValueHigh":
            v = act.new_value if act.b_is_set else act.value
            op = scalar2fea(v)[4:8]
        elif fn == "GetSiblingValueLow":
            op = scalar2fea(act.ins_value)[0:4]
        elif fn == "GetSiblingValueHigh":
            op = scalar2fea(act.ins_value)[4:8]
        elif fn == "GetOldValueLow":
            op = scalar2fea(act.old_value)[0:4]
        elif fn == "GetOldValueHigh":
            op = scalar2fea(act.old_value)[4:8]
        elif fn == "GetLevelBit":
            if ctx.level & (1 << line.params[0]):
                op[0] = 1
        elif fn == "GetTopTree":
            if ctx.current_level > 0:
                op[0] = 1
        elif fn == "GetTopOfBranch":
            if ctx.current_level > len(act.siblings):
                op[0] = 1
        elif fn == "GetNextKeyBit":
            ctx.current_level -= 1
            assert ctx.current_level >= 0, "GetNextKeyBit below level 0"
            op[0] = ctx.bits[ctx.current_level]
        elif fn == "isAlmostEndPolynomial":
            if i == n - 2:
                op[0] = 1
        else:
            raise ValueError(f"unknown storage ROM funcName {fn}")
        return op

    @staticmethod
    def _latch(pols, i, act, is_set: bool) -> None:
        from ...hashdb.smt import fea2scalar as f2s

        if is_set:
            assert act.b_is_set, "LATCH SET on a get action"
            old = act.old_root
            new = act.new_root
            value = act.new_value
        else:
            assert not act.b_is_set, "LATCH GET on a set action"
            old = act.root
            new = None
            value = act.value
        for j in range(4):
            assert int(pols[f"oldRoot{j}"][i]) == old[j], \
                f"storage latch oldRoot mismatch at row {i}"
            if new is not None:
                assert int(pols[f"newRoot{j}"][i]) == new[j], \
                    f"storage latch newRoot mismatch at row {i}"
            assert int(pols[f"rkey{j}"][i]) == act.key[j], \
                f"storage latch key mismatch at row {i}"
        assert [int(pols[f"level{j}"][i]) for j in range(4)] == \
            [1, 0, 0, 0], f"storage latch level state at row {i}"
        got = f2s([int(pols[f"valueLow{j}"][i]) for j in range(4)]
                  + [int(pols[f"valueHigh{j}"][i]) for j in range(4)])
        assert got == value, f"storage latch value mismatch at row {i}"

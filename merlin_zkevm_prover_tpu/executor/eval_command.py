"""freeInTag command evaluator (reference src/main_sm/fork_5/main/
eval_command.cpp, 2,424 LoC).

Evaluates the zkASM free-input expression AST over 256-bit scalars:
arithmetic/bitwise/comparison ops, register and variable access, and the
function-call registry (EC point helpers, batch-input getters, memAlign
write helpers).  Functions needing batch input read from
ctx.input_data; unimplemented functions raise with the name so coverage
gaps are explicit.
"""

from __future__ import annotations

from typing import Dict, List

from ..ops.goldilocks import P
from .rom import RomLine

MASK256 = (1 << 256) - 1

# secp256k1 parameters (reference src/ffiasm fec/fnec usage)
FPEC = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
FNEC = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141


def _fea2scalar(limbs: List[int]) -> int:
    return sum(int(v) << (32 * i) for i, v in enumerate(limbs))


def _reg_value(ctx, name: str) -> int:
    if name in ("A", "B", "C", "D", "E", "SR"):
        return _fea2scalar(getattr(ctx, name))
    if name == "CTX":
        return ctx.CTX
    if name == "SP":
        return ctx.SP
    if name == "PC":
        return ctx.PC
    if name == "GAS":
        return ctx.GAS
    if name == "RR":
        return ctx.RR
    if name == "RCX":
        return ctx.RCX
    if name == "STEP":
        return ctx.counters.steps
    if name == "HASHPOS":
        return ctx.HASHPOS
    if name == "zkPC":
        return ctx.zkPC
    if name == "CNT_ARITH":
        return ctx.counters.arith
    if name == "CNT_BINARY":
        return ctx.counters.binary
    if name == "CNT_KECCAK_F":
        return ctx.counters.keccak_f
    if name == "CNT_MEM_ALIGN":
        return ctx.counters.mem_align
    if name == "CNT_PADDING_PG":
        return ctx.counters.padding_pg
    if name == "CNT_POSEIDON_G":
        return ctx.counters.poseidon_g
    raise ValueError(f"unknown register {name}")


def eval_command(ctx, tag: dict) -> int:
    op = tag.get("op", "")
    vals = tag.get("values", [])

    def ev(i):
        return eval_command(ctx, vals[i])

    if op == "number":
        return int(tag["num"])
    if op == "getReg":
        return _reg_value(ctx, tag["regName"])
    if op == "declareVar":
        ctx.vars[tag["varName"]] = 0
        return 0
    if op == "setVar":
        # values[0] names the variable (declareVar/getVar node), values[1]
        # is the value expression (reference eval_setVar, eval_command.cpp
        # :167-197)
        if "varName" in tag:  # direct form: setVar{varName, values:[expr]}
            value = eval_command(ctx, vals[0])
            ctx.vars[tag["varName"]] = value
            return value
        name = vals[0].get("varName")
        if name is None:
            raise ValueError("setVar without varName")
        if vals[0].get("op") == "declareVar":
            ctx.vars.setdefault(name, 0)  # eval_left declares on the fly
        if name not in ctx.vars:
            raise ValueError(f"setVar on undeclared var {name}")
        value = eval_command(ctx, vals[1])
        ctx.vars[name] = value
        return value
    if op == "getVar":
        name = tag["varName"]
        if name not in ctx.vars:
            raise ValueError(f"undeclared var {name}")
        return ctx.vars[name]
    # arithmetic is unbounded (reference evaluates over mpz, masking only
    # at fea conversion time — eval_command.cpp scalar ops)
    if op == "add":
        return ev(0) + ev(1)
    if op == "sub":
        return ev(0) - ev(1)
    if op == "neg":
        return -ev(0)
    if op == "mul":
        return ev(0) * ev(1)
    if op == "div":
        # mpz division truncates toward zero (C++ semantics), python floors
        a, b = ev(0), ev(1)
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q
    if op == "mod":
        # mpz remainder carries the dividend's sign
        a, b = ev(0), ev(1)
        r = abs(a) % abs(b)
        return -r if a < 0 else r
    if op == "exp":
        return pow(ev(0), ev(1))
    if op == "or":
        return 1 if (ev(0) or ev(1)) else 0
    if op == "and":
        return 1 if (ev(0) and ev(1)) else 0
    if op == "not":
        return 0 if ev(0) else 1
    if op == "gt":
        return 1 if ev(0) > ev(1) else 0
    if op == "ge":
        return 1 if ev(0) >= ev(1) else 0
    if op == "lt":
        return 1 if ev(0) < ev(1) else 0
    if op == "le":
        return 1 if ev(0) <= ev(1) else 0
    if op == "eq":
        return 1 if ev(0) == ev(1) else 0
    if op == "ne":
        return 1 if ev(0) != ev(1) else 0
    if op == "bitand":
        return ev(0) & ev(1)
    if op == "bitor":
        return ev(0) | ev(1)
    if op == "bitxor":
        return ev(0) ^ ev(1)
    if op == "bitnot":
        return (~ev(0)) & MASK256
    if op == "shl":
        return ev(0) << ev(1)
    if op == "shr":
        return ev(0) >> ev(1)
    if op == "if":
        return ev(1) if ev(0) else ev(2)
    if op == "getMemValue":
        # reference eval_getMemValue (eval_command.cpp:1102-1111): absolute
        # memory offset, no CTX segmentation
        fea = ctx.mem.get(int(tag["offset"]), [0] * 8)
        return sum((int(v) & 0xFFFFFFFF) << (32 * i)
                   for i, v in enumerate(fea))
    if op == "functionCall":
        return eval_function(ctx, tag)
    raise ValueError(f"unknown command op '{op}'")


def eval_function(ctx, tag: dict) -> int:
    name = tag["funcName"]
    params = tag.get("params", [])

    def pv(i):
        return eval_command(ctx, params[i])

    inp = ctx.input_data

    if name == "getGlobalExitRoot":
        return int(inp.get("globalExitRoot", 0))
    if name == "getSequencerAddr":
        return int(inp.get("sequencerAddr", 0))
    if name == "getTimestamp":
        return int(inp.get("timestamp", 0))
    if name == "getTxsLen":
        return len(bytes.fromhex(inp.get("batchL2Data", ""))) \
            if isinstance(inp.get("batchL2Data", ""), str) \
            else len(inp.get("batchL2Data", b""))
    if name == "getTxs":
        data = inp.get("batchL2Data", b"")
        if isinstance(data, str):
            data = bytes.fromhex(data)
        p = pv(0)
        length = pv(1)
        chunk = data[p:p + length]
        chunk = chunk + b"\x00" * (length - len(chunk))
        # right-aligned (plain big-endian scalar) — reference ba2fea
        # (scalar.hpp:283-303)
        return int.from_bytes(chunk, "big")
    if name == "beforeLast":
        # reference eval_beforeLast (eval_command.cpp:1544-1571): fea with
        # fea0 = -1 while step < N-2, then 0.  Fast mode (ctx.N == 0)
        # returns 0 immediately so the ROM's padding spin ends.
        if ctx.N and ctx.counters.steps < ctx.N - 2:
            return [P - 1, 0, 0, 0, 0, 0, 0, 0]
        return [0] * 8
    if name == "cond":
        # reference eval_cond: fea0 = -1 (field) if param != 0 else 0
        if pv(0) != 0:
            return [P - 1, 0, 0, 0, 0, 0, 0, 0]
        return [0] * 8
    if name == "inverseFpEc":
        return pow(pv(0), FPEC - 2, FPEC)
    if name == "inverseFnEc":
        return pow(pv(0), FNEC - 2, FNEC)
    if name == "sqrtFpEc":
        v = pv(0) % FPEC
        r = pow(v, (FPEC + 1) // 4, FPEC)
        if r * r % FPEC != v:
            return 0
        return r
    if name in ("xAddPointEc", "yAddPointEc", "xDblPointEc", "yDblPointEc"):
        x1 = _fea2scalar(ctx.A)
        y1 = _fea2scalar(ctx.B)
        if name in ("xDblPointEc", "yDblPointEc"):
            lam = (3 * x1 * x1) * pow(2 * y1 % FPEC, FPEC - 2, FPEC) % FPEC
            x2, y2 = x1, y1
        else:
            x2 = _fea2scalar(ctx.C)
            y2 = _fea2scalar(ctx.D)
            lam = (y2 - y1) * pow((x2 - x1) % FPEC, FPEC - 2, FPEC) % FPEC
        x3 = (lam * lam - x1 - x2) % FPEC
        if name.startswith("x"):
            return x3
        return (lam * (x1 - x3) - y1) % FPEC
    if name == "memAlignWR_W0":
        m0 = pv(0)
        value = pv(1)
        offset = pv(2)
        if offset > 32:
            raise ValueError("memAlignWR_W0 bad offset")
        mask = MASK256 >> (8 * offset) if offset else MASK256
        keep = MASK256 ^ mask
        return (m0 & keep) | ((value >> (8 * offset)) & mask)
    if name == "memAlignWR_W1":
        m1 = pv(0)
        value = pv(1)
        offset = pv(2)
        if offset > 32:
            raise ValueError("memAlignWR_W1 bad offset")
        return ((m1 & (MASK256 >> (8 * offset))) |
                ((value << (8 * (32 - offset))) & MASK256))
    if name == "eventLog":
        # first param names the event (a free-form tag); the event's own
        # arguments live either in the remaining params (onError ref) or
        # nested inside the tag when it is itself a functionCall —
        # `eventLog(onOpcode(0x55))` (rom.json cmdAfter structure)
        ev = params[0] if params else {}
        ev_name = ev.get("funcName") or ev.get("varName") or ev.get("op", "")
        arg_cmds = list(ev.get("params", [])) + list(params[1:])
        vals = []
        for p in arg_cmds:
            if ev_name == "onError" and p.get("op") == "getVar":
                # error identifiers (OOCS, OOG, ...) are symbolic names,
                # not variables with values (reference full_tracer onError
                # reads cmd.params[0]->varName)
                vals.append(p.get("varName", "error"))
                continue
            try:
                vals.append(eval_command(ctx, p))
            except Exception:
                vals.append(0)
        if getattr(ctx, "tracer", None) is not None:
            ctx.tracer.handle_event(ev_name, ctx, vals)
        return 0
    if name == "storeLog":
        vals = []
        for p in params:
            try:
                vals.append(eval_command(ctx, p))
            except Exception:
                vals.append(0)
        if getattr(ctx, "tracer", None) is not None:
            ctx.tracer.handle_store_log(ctx, vals)
        return 0
    if name == "memAlignWR8_W0":
        m0 = pv(0)
        value = pv(1) & 0xFF
        offset = pv(2)
        sh = 8 * (31 - offset)
        return (m0 & ~(0xFF << sh)) | (value << sh)
    raise ValueError(f"unimplemented function '{name}'")

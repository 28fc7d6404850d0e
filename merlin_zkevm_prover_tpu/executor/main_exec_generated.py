"""ROM-specialized generated fast executor (main_exec_generated role).

The reference ships a build-time `mainGenerator` that unrolls rom.json
into straight-line C++ (src/main_generator/main_generator.cpp:25-44),
producing `main_exec_generated{,_fast}` — the `_fast` variant skips pols
writes and serves the latency path (executor.cpp:140-173 picks it for
process_batch).  This module is the framework's equivalent: it compiles
each ROM line into a specialized Python step function with every
selector coefficient, flag branch and constant folded at generation
time — no per-step flag/dict interpretation — and the per-line constant
contribution (CONST/CONSTL limbs) pre-reduced.  Heavy operations
(free-input resolution, storage, binary, arith, memAlign, hash streams)
delegate to the shared MainExecutor helpers so the semantics stay
identical to the interpreter (tests/test_main_exec_generated.py pins
state roots and counters against it on the reference testvectors).

Fast mode only: like the reference `main_exec_generated_fast`, pols
recording and opcode tracing take the interpreter path.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from .main_executor import (
    CTX_OFFSET,
    FR_FIRST_32_NEGATIVE,
    FR_LAST_32_POSITIVE,
    MEM_OFFSET,
    STACK_OFFSET,
    Context,
    ExecutorError,
    HashState,
    MainExecutor,
    fe_to_s32,
    fea8,
)
from ..hashdb.smt import fea2scalar
from ..ops.goldilocks import P
from .rom import Rom, RomLine

# in* selectors contributing full 8-limb registers
_REG_INS = [("inA", "A"), ("inB", "B"), ("inC", "C"), ("inD", "D"),
            ("inE", "E"), ("inSR", "SR")]
# scalar selectors: (name, expression yielding the scalar)
_SCALAR_INS = [
    ("inCTX", "ctx.CTX"), ("inSP", "ctx.SP"), ("inPC", "ctx.PC"),
    ("inGAS", "ctx.GAS"),
    ("inSTEP", "(0 if ctx.no_counters else ctx.counters.steps)"),
    ("inRR", "ctx.RR"), ("inHASHPOS", "ctx.HASHPOS"), ("inRCX", "ctx.RCX"),
    ("inCntArith", "(0 if ctx.no_counters else ctx.counters.arith)"),
    ("inCntBinary", "(0 if ctx.no_counters else ctx.counters.binary)"),
    ("inCntKeccakF", "(0 if ctx.no_counters else ctx.counters.keccak_f)"),
    ("inCntMemAlign", "(0 if ctx.no_counters else ctx.counters.mem_align)"),
    ("inCntPaddingPG", "(0 if ctx.no_counters else ctx.counters.padding_pg)"),
    ("inCntPoseidonG", "(0 if ctx.no_counters else ctx.counters.poseidon_g)"),
]

_OP_CONSUMER_FLAGS = (
    "assert", "mOp", "hashK", "hashK1", "hashP", "hashP1", "bin",
    "arith", "arithEq0", "arithEq1", "arithEq2",
    "memAlignRD", "memAlignWR", "memAlignWR8", "hashPDigest", "sWR",
    "setA", "setB", "setC", "setD", "setE", "setSR",
)

_SNAPSHOT = ("ctx.final_regs = {'A': ctx.A, 'B': ctx.B, 'C': ctx.C, "
             "'D': ctx.D, 'E': ctx.E, 'SR': ctx.SR, 'CTX': ctx.CTX, "
             "'SP': ctx.SP, 'PC': ctx.PC, 'GAS': ctx.GAS, 'RR': ctx.RR, "
             "'HASHPOS': ctx.HASHPOS, 'RCX': ctx.RCX}")


def _emit_line(i: int, line: RomLine, rom_size: int) -> List[str]:
    """Source lines for `def step_{i}(ex, ctx, eval_command)`."""
    f = line.flag
    out: List[str] = [f"def step_{i}(ex, ctx, eval_command):"]
    body: List[str] = []
    B = body.append
    ln = f"_L[{i}]"

    has_jump = any(f(x) for x in
                   ("JMP", "JMPN", "JMPC", "JMPZ", "call", "return"))
    is_repeat = f("repeat") and not f("setRCX")
    wrap_label = "start" in (line.jmp_addr_label, line.else_addr_label)
    # terminal-capable lines snapshot row-entry registers (the PIL reads
    # its end-state publics from the LAST row's entry values)
    may_terminate = has_jump or is_repeat or i + 1 >= rom_size
    if may_terminate:
        B(_SNAPSHOT)

    if line.cmd_before:
        B(f"for cmd in {ln}.cmd_before: eval_command(ctx, cmd)")

    # ---- address ----
    needs_addr = any(f(x) for x in ("ind", "indRR", "mOp", "JMP", "JMPN",
                                    "JMPC", "JMPZ", "call"))
    uses_addr = needs_addr or any(f(x) for x in (
        "hashK", "hashK1", "hashKLen", "hashKDigest", "hashP", "hashP1",
        "hashPLen", "hashPDigest", "sRD", "sWR", "memAlignRD",
        "memAlignWR", "memAlignWR8")) or "inFREE" in line.ins
    if needs_addr:
        terms = []
        if f("ind"):
            terms.append("fe_to_s32(ctx.E[0])")
        if f("indRR"):
            terms.append("fe_to_s32(ctx.RR)")
        if line.offset:
            terms.append(str(line.offset))
        if f("isStack"):
            terms.append("ctx.SP")
        B(f"addr = {' + '.join(terms) if terms else '0'}")
        limit = (0x20000 if f("isMem") else 0x10000) - 2048
        if terms:
            B(f"if addr >= {limit} or addr < 0:")
            B(f"    raise ExecutorError('ADDR', 'addrRel out of range at "
              f"zkPC={i}')")
        adds = []
        if f("isStack"):
            adds.append(str(STACK_OFFSET))
        if f("isMem"):
            adds.append(str(MEM_OFFSET))
        if f("useCTX"):
            adds.append(f"ctx.CTX * {CTX_OFFSET}")
        if adds:
            B(f"addr += {' + '.join(adds)}")
    elif uses_addr:
        B("addr = 0")

    # ---- op construction (constants folded) ----
    base = [0] * 8
    if line.const is not None:
        base[0] = line.const % P
    if line.constl is not None:
        for k, v in enumerate(fea8(line.constl)):
            base[k] = (base[k] + v) % P
    reg_terms: List[List[str]] = [[] for _ in range(8)]
    for name, reg in _REG_INS:
        if name in line.ins:
            c = line.ins[name]
            for k in range(8):
                reg_terms[k].append(f"{c} * ctx.{reg}[{k}]")
    if "inROTL_C" in line.ins:
        c = line.ins["inROTL_C"]
        reg_terms[0].append(f"{c} * ctx.C[7]")
        for k in range(1, 8):
            reg_terms[k].append(f"{c} * ctx.C[{k - 1}]")
    for name, expr in _SCALAR_INS:
        if name in line.ins:
            reg_terms[0].append(f"{line.ins[name]} * {expr}")

    has_free = "inFREE" in line.ins
    if has_free:
        B(f"fi = ex._free_input(ctx, {ln}, addr, eval_command)")
        cf = line.ins["inFREE"]
        for k in range(8):
            reg_terms[k].append(f"{cf} * fi[{k}]")

    needs_op_list = any(f(x) for x in _OP_CONSUMER_FLAGS)
    op0_used = needs_op_list or any(f(x) for x in (
        "JMPN", "JMPZ", "setCTX", "setSP", "setPC", "setGAS", "setRR",
        "setHASHPOS", "setRCX", "hashKLen", "hashPLen"))
    if needs_op_list:
        for k in range(8):
            terms = reg_terms[k]
            if base[k]:
                terms = [str(base[k])] + terms
            B(f"o{k} = ({' + '.join(terms)}) % P" if terms
              else f"o{k} = 0")
        B("op = [o0, o1, o2, o3, o4, o5, o6, o7]")
    elif op0_used:
        terms = reg_terms[0]
        if base[0]:
            terms = [str(base[0])] + terms
        B(f"o0 = ({' + '.join(terms)}) % P" if terms else "o0 = 0")

    # ---- assert / memory / hash / bin / arith / memAlign ----
    if f("assert"):
        B("if op != [a % P for a in ctx.A]:")
        B(f"    raise ExecutorError('ASSERT', 'assert failed at zkPC={i}')")
    if f("mOp") and f("mWR"):
        B("ctx.mem[addr] = list(op)")
        B("ctx.required.memory.append({'addr': addr, 'wr': True, "
          "'value': list(op), 'step': ctx.counters.steps})")
    elif f("mOp"):
        B("val = ctx.mem.get(addr, [0] * 8)")
        B("ctx.required.memory.append({'addr': addr, 'wr': False, "
          "'value': list(val), 'step': ctx.counters.steps})")
        if not has_free:
            B("if val != op:")
            B(f"    raise ExecutorError('MEM', 'memory check failed at "
              f"zkPC={i}')")
    if f("hashK") or f("hashK1"):
        B(f"ex._hash_absorb(ctx, ctx.hash_k, {ln}, op, addr, "
          f"one={bool(f('hashK1'))})")
    if f("hashKLen"):
        B("hs = ctx.hash_k.setdefault(addr, HashState())")
        B("ln_ = fe_to_s32(o0)")
        B("if len(hs.data) > ln_:")
        B("    raise ExecutorError('HASHK', 'hashKLen shorter than data')")
        B("hs.data.extend(b'\\x00' * (ln_ - len(hs.data)))")
        B("hs.len_called = True")
    if f("hashP") or f("hashP1"):
        B(f"ex._hash_absorb(ctx, ctx.hash_p, {ln}, op, addr, "
          f"one={bool(f('hashP1'))})")
    if f("hashPLen"):
        B("hs = ctx.hash_p.setdefault(addr, HashState())")
        B("ln_ = fe_to_s32(o0)")
        B("hs.data.extend(b'\\x00' * (ln_ - len(hs.data)))")
        B("hs.len_called = True")
    if f("bin"):
        B(f"ex._binary(ctx, {ln}, op)")
    if f("arithEq0") or f("arithEq1") or f("arithEq2") or f("arith"):
        B(f"ex._arith(ctx, {ln}, op)")
    if f("memAlignRD") or f("memAlignWR") or f("memAlignWR8"):
        B(f"ex._mem_align(ctx, {ln}, op)")

    if f("hashPDigest") and not has_free:
        B("dg = fea2scalar(op)")
        B("if addr not in ctx.hash_p:")
        B("    key = tuple((dg >> (64 * j)) & 0xFFFFFFFFFFFFFFFF "
          "for j in range(4))")
        B("    data = ctx.hashdb.get_program(key)")
        B("    if data is None:")
        B(f"        raise ExecutorError('HASHP', 'program not found at "
          f"zkPC={i}')")
        B("    hs = HashState(data=bytearray(data)); hs.digest = dg")
        B("    hs.digest_called = True; ctx.hash_p[addr] = hs")
        B("else:")
        B("    hs = ctx.hash_p[addr]; hs.digest_called = True")
        B("    if hs.digest is None: ex._hash_p_digest(ctx, hs)")
        B("    if hs.digest != dg:")
        B(f"        raise ExecutorError('HASHP', 'hashPDigest mismatch at "
          f"zkPC={i}')")
    if f("hashPDigest") or f("sWR"):
        B("v = fea2scalar(op)")
        B("ctx.required.binary.append({'a': v, 'b': 0, 'c': v, "
          "'opcode': 1, 'type': 2})")
    if f("hashPDigest"):
        B("hs = ctx.hash_p.get(addr)")
        B("inc = -(-((len(hs.data) if hs else 0) + 1) // 56)")
        B("ctx.counters.padding_pg += inc")
        B("ctx.counters.poseidon_g += inc")
        B("ctx.counters.binary += 1")

    # ---- setters ----
    for reg in ("A", "B", "C", "D", "E", "SR"):
        if f(f"set{reg}"):
            B(f"ctx.{reg} = list(op)")
    if f("setCTX"):
        B("ctx.CTX = fe_to_s32(o0)")
    if f("setSP"):
        B("ctx.SP = fe_to_s32(o0)")
    elif line.inc_stack:
        B(f"ctx.SP += {line.inc_stack}")
    if f("setPC"):
        B("ctx.PC = fe_to_s32(o0)")
    if f("setGAS"):
        B("ctx.GAS = o0")
    if f("setRR"):
        B("ctx.RR = o0")
    if f("setHASHPOS"):
        B("ctx.HASHPOS = fe_to_s32(o0)")
    if f("setRCX"):
        B("ctx.RCX = o0")

    # ---- control flow (targets folded where static) ----
    jt = str(line.jmp_addr) if f("useJmpAddr") else "addr"
    et = str(line.else_addr) if f("useElseAddr") else str(i + 1)
    stayed = False
    if f("JMPN"):
        B("if o0 >= FR_FIRST_32_NEGATIVE:")
        B(f"    nz = {jt}")
        B("elif o0 <= FR_LAST_32_POSITIVE:")
        B(f"    nz = {et}")
        B("else:")
        B(f"    raise ExecutorError('S33', 'JMPN invalid op0 at zkPC={i}')")
    elif f("JMPC"):
        B(f"nz = {jt} if ctx.carry else {et}")
    elif f("JMPZ"):
        B(f"nz = {jt} if o0 == 0 else {et}")
    elif f("JMP"):
        B(f"nz = {jt}")
    elif f("call"):
        B(f"ctx.RR = {i + 1}")
        B(f"nz = {jt}")
    elif f("return"):
        B("nz = ctx.RR")
    elif is_repeat:
        B("if ctx.RCX != 0:")
        B("    ctx.RCX = (ctx.RCX - 1) % P")
        B(f"    nz = {i}")
        B("    _stayed = True")
        B("else:")
        B(f"    nz = {i + 1}")
        B("    _stayed = False")
        stayed = True
    else:
        B(f"nz = {i + 1}")

    if line.cmd_after:
        B(f"for cmd in {ln}.cmd_after: eval_command(ctx, cmd)")

    # ---- terminal checks (fast mode; see MainExecutor._step) ----
    B("ctx.zkPC = nz")
    fin = []
    if stayed:
        fin.append(f"(nz == {i} and not _stayed)")
    else:
        fin.append(f"nz == {i}")
    if wrap_label:
        fin.append("(nz == 0 and ctx.counters.steps > 0)")
    fin.append(f"nz >= {rom_size}")
    if has_jump or is_repeat or i + 1 >= rom_size:
        B(f"return {' or '.join(fin)}")
    else:
        B("return False")

    out.extend("    " + b for b in body)
    return out


def generate_source(rom: Rom) -> str:
    """The full generated-module source (the mainGenerator role)."""
    parts: List[str] = []
    for i, line in enumerate(rom.lines):
        parts.extend(_emit_line(i, line, rom.size))
        parts.append("")
    parts.append("STEPS = [" + ", ".join(
        f"step_{i}" for i in range(rom.size)) + "]")
    return "\n".join(parts)


class GeneratedMainExecutor(MainExecutor):
    """Fast-mode executor running the generated per-line step functions.

    Pols recording / opcode tracing requests fall back to the
    interpreter (the reference's `_fast` variant has the same split)."""

    def __init__(self, rom: Rom, hashdb=None, max_steps: int = 1 << 23,
                 jmpn_low_bits: int = 23):
        super().__init__(rom, hashdb, max_steps, jmpn_low_bits)
        src = generate_source(rom)
        ns: Dict[str, object] = {
            "_L": rom.lines, "P": P,
            "ExecutorError": ExecutorError, "HashState": HashState,
            "fe_to_s32": fe_to_s32, "fea2scalar": fea2scalar,
            "FR_FIRST_32_NEGATIVE": FR_FIRST_32_NEGATIVE,
            "FR_LAST_32_POSITIVE": FR_LAST_32_POSITIVE,
        }
        code = compile(src, f"<main_exec_generated:{rom.size} lines>",
                       "exec")
        exec(code, ns)
        self._steps = ns["STEPS"]

    def execute(self, input_data: Optional[dict] = None,
                record_trace: bool = False,
                record_pols: bool = False) -> Context:
        if record_trace or record_pols:
            return super().execute(input_data, record_trace, record_pols)
        ctx = Context(rom=self.rom, hashdb=self.hashdb,
                      input_data=input_data or {})
        ctx.no_counters = bool((input_data or {}).get("noCounters", False))
        tc = (input_data or {}).get("traceConfig", {})
        from .full_tracer import FullTracer, TraceConfig

        ctx.tracer = FullTracer(record_opcodes=bool(tc.get("enabled")),
                                config=TraceConfig.from_dict(tc))
        inp = ctx.input_data
        if "oldStateRoot" in inp:
            ctx.B = fea8(int(inp["oldStateRoot"]))
        if "oldAccInputHash" in inp:
            ctx.C = fea8(int(inp["oldAccInputHash"]))
        ctx.SP = int(inp.get("oldNumBatch", 0))
        ctx.GAS = int(inp.get("chainID", 0))
        ctx.CTX = int(inp.get("forkID", 0))
        from .eval_command import eval_command

        steps = self._steps
        counters = ctx.counters
        max_steps = self.max_steps
        finished = False
        while not finished:
            if counters.steps >= max_steps:
                raise ExecutorError("OOC_STEPS", "out of steps")
            finished = steps[ctx.zkPC](self, ctx, eval_command)
            counters.steps += 1
        return ctx

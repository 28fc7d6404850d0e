"""Main state machine: the zkASM ROM interpreter.

Re-creates the reference `MainExecutor::execute` semantics
(src/main_sm/fork_5/main/main_executor.cpp:53-4580):

  * 256-bit registers A..E held as 8 x 32-bit field elements, scalar
    registers (SR root, CTX, SP, PC, GAS, RR, HASHPOS, RCX, counters);
  * per step: op = sum(in_x * x) + CONST/CONSTL, free input from the
    freeInTag command or implicit sources (memory / storage / hash
    digests), setters, memory ops with CTX/stack/mem segmentation
    (STACK_OFFSET 0x10000, MEM_OFFSET 0x20000, CTX_OFFSET 0x40000),
    storage reads/writes through the Poseidon SMT, binary/arith
    delegation with carry, Keccak/Poseidon hash streams, jumps
    (JMPN on op0 in the 32-bit negative window, JMPC on carry, JMPZ,
    call/return/repeat), counters;
  * emits `required` action lists for the secondary state machines
    (reference executor.cpp:296-458 dispatch).

This is the framework's "fast executor" (process_batch, 1-row pols); the
full 2^23-row trace fill reuses the same step loop with a pols recorder.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..hashdb.hashdb import HashDB
from ..hashdb.smt import fea2scalar, scalar2fea
from ..ops import poseidon_gl
from ..ops.goldilocks import P
from ..utils.keccak import keccak256
from ..utils.zklog import zklog
from .rom import Rom, RomLine

STACK_OFFSET = 0x10000
MEM_OFFSET = 0x20000
CTX_OFFSET = 0x40000
FR_FIRST_32_NEGATIVE = P - 0xFFFFFFFF
FR_LAST_32_POSITIVE = 0xFFFFFFFF

MASK256 = (1 << 256) - 1


class ExecutorError(Exception):
    def __init__(self, code: str, msg: str = ""):
        super().__init__(f"{code}: {msg}")
        self.code = code


def fea8(value: int) -> List[int]:
    return scalar2fea(value & MASK256)


def fe_to_s32(v: int) -> int:
    """Field element -> signed 32-bit (reference fr.toS32)."""
    if v <= 0x7FFFFFFF:
        return v
    if v >= P - 0x80000000:
        return v - P
    raise ExecutorError("S32", f"value out of s32 range: {v}")


@dataclass
class Counters:
    arith: int = 0
    binary: int = 0
    keccak_f: int = 0
    mem_align: int = 0
    padding_pg: int = 0
    poseidon_g: int = 0
    steps: int = 0

    def as_dict(self):
        return dict(cntArith=self.arith, cntBinary=self.binary,
                    cntKeccakF=self.keccak_f, cntMemAlign=self.mem_align,
                    cntPaddingPG=self.padding_pg, cntPoseidonG=self.poseidon_g,
                    cntSteps=self.steps)


@dataclass
class HashState:
    data: bytearray = field(default_factory=bytearray)
    read_len: Dict[int, int] = field(default_factory=dict)
    len_called: bool = False
    digest_called: bool = False
    digest: Optional[int] = None


@dataclass
class Required:
    """Work items for the secondary state machines (reference `required`)."""

    arith: List[dict] = field(default_factory=list)
    binary: List[dict] = field(default_factory=list)
    memory: List[dict] = field(default_factory=list)
    mem_align: List[dict] = field(default_factory=list)
    poseidon_g: List[list] = field(default_factory=list)
    keccak_inputs: List[bytes] = field(default_factory=list)
    padding_pg_inputs: List[bytes] = field(default_factory=list)
    storage: List[dict] = field(default_factory=list)


@dataclass
class Context:
    rom: Rom
    hashdb: HashDB
    # 256-bit registers as 8x 32-bit limb lists
    A: List[int] = field(default_factory=lambda: [0] * 8)
    B: List[int] = field(default_factory=lambda: [0] * 8)
    C: List[int] = field(default_factory=lambda: [0] * 8)
    D: List[int] = field(default_factory=lambda: [0] * 8)
    E: List[int] = field(default_factory=lambda: [0] * 8)
    SR: List[int] = field(default_factory=lambda: [0] * 8)
    CTX: int = 0
    SP: int = 0
    PC: int = 0
    GAS: int = 0
    RR: int = 0
    HASHPOS: int = 0
    RCX: int = 0
    zkPC: int = 0
    carry: int = 0
    counters: Counters = field(default_factory=Counters)
    mem: Dict[int, List[int]] = field(default_factory=dict)
    hash_k: Dict[int, HashState] = field(default_factory=dict)
    hash_p: Dict[int, HashState] = field(default_factory=dict)
    vars: Dict[str, int] = field(default_factory=dict)
    required: Required = field(default_factory=Required)
    input_data: dict = field(default_factory=dict)
    trace: List[dict] = field(default_factory=list)
    tracer: object = None
    # reference input.bNoCounters: STEP/CNT_* read as zero (see _step)
    no_counters: bool = False
    # trace length for beforeLast(); fast mode leaves it at 0 so the ROM's
    # final padding spin exits immediately instead of burning N steps
    N: int = 0
    # register state at entry of the last executed step (= trace row N-1)
    final_regs: Optional[dict] = None
    # optional Main-pols recorder (executor/main_pols.py)
    pols: object = None
    last_skey: Optional[tuple] = None
    # per-row counter increment (reference pols.incCounter, set at
    # sRD/sWR/hashKDigest/hashPDigest rows, main_executor.cpp:4008-4011)
    step_inc_counter: int = 0


def sr8to4(sr8: List[int]) -> Tuple[int, int, int, int]:
    """8x32-bit fea -> 4x64-bit SMT root felts."""
    return (
        sr8[0] | (sr8[1] << 32),
        sr8[2] | (sr8[3] << 32),
        sr8[4] | (sr8[5] << 32),
        sr8[6] | (sr8[7] << 32),
    )


def sr4to8(root: Tuple[int, int, int, int]) -> List[int]:
    out = []
    for v in root:
        out.append(v & 0xFFFFFFFF)
        out.append((v >> 32) & 0xFFFFFFFF)
    return out


def storage_key(ctx: Context) -> Tuple[int, int, int, int]:
    """Poseidon key derivation (reference main_executor.cpp sRD/sWR blocks):
    Kin0 = C0..C7 (capacity zero), Kin1 = A0..A5, B0, B1 (capacity =
    H(Kin0))."""
    kin0 = list(ctx.C)
    kin1 = [ctx.A[0], ctx.A[1], ctx.A[2], ctx.A[3], ctx.A[4], ctx.A[5],
            ctx.B[0], ctx.B[1]]
    key_i = poseidon_gl.permute_host(kin0 + [0, 0, 0, 0])[:4]
    key = poseidon_gl.permute_host(kin1 + list(key_i))[:4]
    ctx.last_skey = (tuple(key_i), tuple(key))
    ctx.counters.poseidon_g += 2
    # 17-felt actions: state, expected digest, permutation id (reference
    # main_executor.cpp:1806,1818 — Kin0 -> PERMUTATION1, Kin1 -> 2)
    ctx.required.poseidon_g.append(kin0 + [0, 0, 0, 0] + list(key_i) + [1])
    ctx.required.poseidon_g.append(kin1 + list(key_i) + list(key) + [2])
    return tuple(key)


class MainExecutor:
    def __init__(self, rom: Rom, hashdb: Optional[HashDB] = None,
                 max_steps: int = 1 << 23, jmpn_low_bits: int = 23):
        self.rom = rom
        self.hashdb = hashdb or HashDB()
        self.max_steps = max_steps
        # width of the JMPN low chunk (reference: 23, baked into
        # main.pil:222; reduced-domain proving re-parametrizes it to
        # n_bits — see stark/pil_importer.py reparam_jmpn)
        self.jmpn_low_bits = jmpn_low_bits

    # ------------------------------------------------------------------
    def execute(self, input_data: Optional[dict] = None,
                record_trace: bool = False,
                record_pols: bool = False) -> Context:
        ctx = Context(rom=self.rom, hashdb=self.hashdb,
                      input_data=input_data or {})
        ctx.no_counters = bool((input_data or {}).get("noCounters", False))
        if record_pols:
            from .main_pols import MainPolsRecorder

            ctx.pols = MainPolsRecorder(self.max_steps)
            ctx.N = self.max_steps
        # the tracer always runs (the reference instantiates FullTracer for
        # every request — responses/read_write_addresses are part of the
        # ProcessBatch contract); per-opcode capture only when a trace was
        # asked for (traceConfig.enabled) or in full record mode
        tc = (input_data or {}).get("traceConfig", {})
        from .full_tracer import FullTracer, TraceConfig

        ctx.tracer = FullTracer(
            record_opcodes=bool(tc.get("enabled")) or record_trace,
            config=TraceConfig.from_dict(tc))
        # initState (reference main_executor.cpp:4351-4367): B=oldStateRoot,
        # C=oldAccInputHash, SP=oldBatchNum, GAS=chainID, CTX=forkID
        inp = ctx.input_data
        # (SR is NOT preset: the ROM's start sequence assigns SR from B,
        # reference initState main_executor.cpp:4351-4367 sets B/C/SP/GAS/CTX)
        if "oldStateRoot" in inp:
            ctx.B = fea8(int(inp["oldStateRoot"]))
        if "oldAccInputHash" in inp:
            ctx.C = fea8(int(inp["oldAccInputHash"]))
        ctx.SP = int(inp.get("oldNumBatch", 0))
        ctx.GAS = int(inp.get("chainID", 0))
        ctx.CTX = int(inp.get("forkID", 0))
        from .eval_command import eval_command  # cycle-free local import

        finished = False
        while not finished:
            if ctx.counters.steps >= self.max_steps:
                raise ExecutorError("OOC_STEPS", "out of steps")
            line = self.rom.lines[ctx.zkPC]
            finished = self._step(ctx, line, eval_command, record_trace)
            ctx.counters.steps += 1
        if ctx.pols is not None:
            ctx.pols.finalize_wrap(ctx)
        return ctx

    # ------------------------------------------------------------------
    def _step(self, ctx: Context, line: RomLine, eval_command,
              record_trace: bool) -> bool:
        # row-entry register snapshot (register lists are replaced, never
        # mutated, so keeping references is O(1)); after the final step this
        # holds row N-1 — where the PIL reads newStateRoot/newAccInputHash/
        # localExitRoot/newBatchNum publics (main.pil publics idx 8388607)
        ctx.final_regs = {
            "A": ctx.A, "B": ctx.B, "C": ctx.C, "D": ctx.D, "E": ctx.E,
            "SR": ctx.SR, "CTX": ctx.CTX, "SP": ctx.SP, "PC": ctx.PC,
            "GAS": ctx.GAS, "RR": ctx.RR, "HASHPOS": ctx.HASHPOS,
            "RCX": ctx.RCX,
        }
        counters_pre = Counters(**ctx.counters.__dict__) \
            if ctx.pols is not None else None
        ctx.last_skey = None
        ctx.step_inc_counter = 0
        if line.cmd_before:
            for cmd in line.cmd_before:
                eval_command(ctx, cmd)
        # ---- address computation ----
        addr_rel = 0
        addr = 0
        if (line.flag("ind") or line.flag("indRR") or line.flag("mOp")
                or line.flag("JMP") or line.flag("JMPN") or line.flag("JMPC")
                or line.flag("JMPZ") or line.flag("call")):
            if line.flag("ind"):
                addr_rel = fe_to_s32(ctx.E[0])
            if line.flag("indRR"):
                addr_rel = fe_to_s32(ctx.RR)
            if line.offset:
                addr_rel += line.offset
            if line.flag("isStack"):
                addr_rel += ctx.SP
            limit = (0x20000 if line.flag("isMem") else 0x10000) - 2048
            if addr_rel >= limit:
                raise ExecutorError("ADDR", f"addrRel too big {addr_rel}")
            if addr_rel < 0:
                raise ExecutorError("ADDR", f"addrRel negative {addr_rel}")
            addr = addr_rel
        if line.flag("isStack"):
            addr += STACK_OFFSET
        if line.flag("isMem"):
            addr += MEM_OFFSET
        if line.flag("useCTX"):
            addr += ctx.CTX * CTX_OFFSET

        # ---- op construction ----
        op = [0] * 8

        def add_reg(coef: int, limbs: List[int]):
            for i in range(8):
                op[i] = (op[i] + coef * limbs[i]) % P

        def add_scalar(coef: int, v: int):
            op[0] = (op[0] + coef * v) % P

        ins = line.ins
        if "inA" in ins:
            add_reg(ins["inA"], ctx.A)
        if "inB" in ins:
            add_reg(ins["inB"], ctx.B)
        if "inC" in ins:
            add_reg(ins["inC"], ctx.C)
        if "inD" in ins:
            add_reg(ins["inD"], ctx.D)
        if "inE" in ins:
            add_reg(ins["inE"], ctx.E)
        if "inSR" in ins:
            add_reg(ins["inSR"], ctx.SR)
        if "inROTL_C" in ins:
            rot = [ctx.C[7]] + ctx.C[0:7]
            add_reg(ins["inROTL_C"], rot)
        # with no_counters (reference input.bNoCounters,
        # main_executor.cpp:472,3707-4057), STEP and all CNT_* registers
        # read as zero so the ROM's out-of-counters checks never fire —
        # the mode the performance testvectors were generated under
        nc = ctx.no_counters
        for name, val in (
            ("inCTX", ctx.CTX), ("inSP", ctx.SP), ("inPC", ctx.PC),
            ("inGAS", ctx.GAS),
            ("inSTEP", 0 if nc else ctx.counters.steps),
            ("inRR", ctx.RR), ("inHASHPOS", ctx.HASHPOS),
            ("inRCX", ctx.RCX),
            ("inCntArith", 0 if nc else ctx.counters.arith),
            ("inCntBinary", 0 if nc else ctx.counters.binary),
            ("inCntKeccakF", 0 if nc else ctx.counters.keccak_f),
            ("inCntMemAlign", 0 if nc else ctx.counters.mem_align),
            ("inCntPaddingPG", 0 if nc else ctx.counters.padding_pg),
            ("inCntPoseidonG", 0 if nc else ctx.counters.poseidon_g),
        ):
            if name in ins:
                add_scalar(ins[name], val)
        if line.const is not None:
            add_scalar(1, line.const % P)
        if line.constl is not None:
            for i, v in enumerate(fea8(line.constl)):
                op[i] = (op[i] + v) % P

        # ---- free input ----
        fi_rec = None
        if "inFREE" in ins:
            fi = self._free_input(ctx, line, addr, eval_command)
            fi_rec = fi
            coef = ins["inFREE"]
            for i in range(8):
                op[i] = (op[i] + coef * fi[i]) % P

        # ---- assert ----
        if line.flag("assert"):
            if op != [a % P for a in ctx.A]:
                raise ExecutorError(
                    "ASSERT", f"assert failed at zkPC={ctx.zkPC} "
                              f"op={op} A={ctx.A}"
                )

        # ---- memory write ----
        if line.flag("mOp") and line.flag("mWR"):
            ctx.mem[addr] = list(op)
            ctx.required.memory.append(
                {"addr": addr, "wr": True, "value": list(op),
                 "step": ctx.counters.steps}
            )
        elif line.flag("mOp"):
            val = ctx.mem.get(addr, [0] * 8)
            ctx.required.memory.append(
                {"addr": addr, "wr": False, "value": list(val),
                 "step": ctx.counters.steps}
            )
            if "inFREE" not in ins and val != op:
                raise ExecutorError("MEM", f"memory check failed at {addr}")

        # ---- storage write (sWR): new root must equal op via free input;
        # the state transition itself happened in _free_input ----

        # ---- keccak / poseidon hash streams ----
        if line.flag("hashK") or line.flag("hashK1"):
            self._hash_absorb(ctx, ctx.hash_k, line, op, addr,
                              one=line.flag("hashK1"))
        if line.flag("hashKLen"):
            hs = ctx.hash_k.setdefault(addr, HashState())
            ln = fe_to_s32(op[0])
            if len(hs.data) > ln:
                raise ExecutorError("HASHK", "hashKLen shorter than data")
            hs.data.extend(b"\x00" * (ln - len(hs.data)))
            hs.len_called = True
        if line.flag("hashP") or line.flag("hashP1"):
            self._hash_absorb(ctx, ctx.hash_p, line, op, addr,
                              one=line.flag("hashP1"))
        if line.flag("hashPLen"):
            hs = ctx.hash_p.setdefault(addr, HashState())
            ln = fe_to_s32(op[0])
            hs.data.extend(b"\x00" * (ln - len(hs.data)))
            hs.len_called = True

        # ---- binary ----
        if line.flag("bin"):
            self._binary(ctx, line, op)

        # ---- arith ----
        if line.flag("arithEq0") or line.flag("arithEq1") or \
                line.flag("arithEq2") or line.flag("arith"):
            self._arith(ctx, line, op)

        # ---- memAlign ----
        if line.flag("memAlignRD") or line.flag("memAlignWR") or \
                line.flag("memAlignWR8"):
            self._mem_align(ctx, line, op)

        # ---- hashPDigest as an instruction: op carries the digest; load
        # the program from the DB when the stream is absent (contract
        # bytecode path, reference main_executor.cpp:2611-2665) ----
        if line.flag("hashPDigest") and "inFREE" not in ins:
            dg = fea2scalar(op)
            if addr not in ctx.hash_p:
                key = tuple((dg >> (64 * i)) & ((1 << 64) - 1)
                            for i in range(4))
                data = ctx.hashdb.get_program(key)
                if data is None:
                    raise ExecutorError(
                        "HASHP", f"program not found for digest {hex(dg)}")
                hs = HashState(data=bytearray(data))
                hs.digest = dg
                hs.digest_called = True
                ctx.hash_p[addr] = hs
            else:
                hs = ctx.hash_p[addr]
                hs.digest_called = True
                if hs.digest is None:
                    self._hash_p_digest(ctx, hs)
                if hs.digest != dg:
                    raise ExecutorError(
                        "HASHP", f"hashPDigest mismatch at zkPC={ctx.zkPC}")

        # ---- op range proof: sWR/hashPDigest push a type-2 Binary action
        # (SUB op-0 == op) proving op is a canonical 256-bit value
        # (reference main_executor.cpp:2674-2694) ----
        if line.flag("hashPDigest") or line.flag("sWR"):
            v = fea2scalar(op)
            ctx.required.binary.append(
                {"a": v, "b": 0, "c": v, "opcode": 1, "type": 2})
        if line.flag("hashPDigest"):
            # per-ROW accounting (reference main_executor.cpp:2662):
            # cntPaddingPG/cntPoseidonG += ceil((len+1)/56), cntBinary += 1
            hs = ctx.hash_p.get(addr)
            inc = -(-((len(hs.data) if hs else 0) + 1) // 56)
            ctx.counters.padding_pg += inc
            ctx.counters.poseidon_g += inc
            ctx.counters.binary += 1
            ctx.step_inc_counter = inc

        # ---- setters ----
        if line.flag("setA"):
            ctx.A = list(op)
        if line.flag("setB"):
            ctx.B = list(op)
        if line.flag("setC"):
            ctx.C = list(op)
        if line.flag("setD"):
            ctx.D = list(op)
        if line.flag("setE"):
            ctx.E = list(op)
        if line.flag("setSR"):
            ctx.SR = list(op)
        if line.flag("setCTX"):
            ctx.CTX = fe_to_s32(op[0])
        if line.flag("setSP"):
            ctx.SP = fe_to_s32(op[0])
        elif line.inc_stack:
            ctx.SP += line.inc_stack
        if line.flag("setPC"):
            ctx.PC = fe_to_s32(op[0])
        if line.flag("setGAS"):
            ctx.GAS = op[0]
        if line.flag("setRR"):
            ctx.RR = op[0]
        if line.flag("setHASHPOS"):
            ctx.HASHPOS = fe_to_s32(op[0])
        if line.flag("setRCX"):
            ctx.RCX = op[0]

        if record_trace:
            ctx.trace.append(
                {"zkPC": ctx.zkPC, "op": list(op), "step": ctx.counters.steps}
            )

        # ---- control flow ----
        next_zkpc = ctx.zkPC + 1
        stayed_for_repeat = False
        if line.flag("JMPN"):
            v = op[0]
            if v >= FR_FIRST_32_NEGATIVE:
                next_zkpc = line.jmp_addr if line.flag("useJmpAddr") else addr
            elif v <= FR_LAST_32_POSITIVE:
                next_zkpc = (line.else_addr if line.flag("useElseAddr")
                             else ctx.zkPC + 1)
            else:
                raise ExecutorError("S33", f"JMPN invalid op0={v}")
        elif line.flag("JMPC"):
            if ctx.carry:
                next_zkpc = line.jmp_addr if line.flag("useJmpAddr") else addr
            else:
                next_zkpc = (line.else_addr if line.flag("useElseAddr")
                             else ctx.zkPC + 1)
        elif line.flag("JMPZ"):
            if op[0] == 0:
                next_zkpc = line.jmp_addr if line.flag("useJmpAddr") else addr
            else:
                next_zkpc = (line.else_addr if line.flag("useElseAddr")
                             else ctx.zkPC + 1)
        elif line.flag("JMP"):
            next_zkpc = line.jmp_addr if line.flag("useJmpAddr") else addr
        elif line.flag("call"):
            ctx.RR = ctx.zkPC + 1
            next_zkpc = line.jmp_addr if line.flag("useJmpAddr") else addr
        elif line.flag("return"):
            next_zkpc = ctx.RR
        elif line.flag("repeat") and not line.flag("setRCX"):
            # reference main_executor.cpp:3773-3780 + 3976-3979: the jump
            # decision uses the ROW-ENTRY RCX; RCX decrements while nonzero
            if ctx.RCX != 0:
                ctx.RCX = (ctx.RCX - 1) % P
                next_zkpc = ctx.zkPC
                stayed_for_repeat = True

        if ctx.pols is not None:
            extra = {"carry": ctx.carry, "counters_pre": counters_pre,
                     "incCounter": ctx.step_inc_counter}
            if line.flag("JMPN"):
                v = op[0]
                isneg = 1 if v >= FR_FIRST_32_NEGATIVE else 0
                extra["isNeg"] = isneg
                # low chunk + 9 committed bits (reference
                # main_executor.cpp:3873-3880; width 23 at production)
                w = self.jmpn_low_bits
                cond = (v + (1 << (w + 9))) % P if isneg else v
                if cond >= (1 << (w + 9)):
                    raise ExecutorError(
                        "JMPN_RANGE",
                        f"JMPN value {v} exceeds the 2^{w + 9} window at "
                        f"zkPC={ctx.zkPC} (domain too small?)")
                extra["lJmpnCondValue"] = cond & ((1 << w) - 1)
                for j in range(9):
                    extra[f"hJmpnCondValueBit{j}"] = (cond >> (w + j)) & 1
            if op[0] != 0:
                extra["op0Inv"] = pow(op[0], P - 2, P)
            rcx_row = ctx.final_regs["RCX"] % P if ctx.final_regs else 0
            if rcx_row:
                extra["RCXInv"] = pow(rcx_row, P - 2, P)
            if ctx.last_skey is not None:
                for j in range(4):
                    extra[f"sKeyI{j}"] = ctx.last_skey[0][j]
                    extra[f"sKey{j}"] = ctx.last_skey[1][j]
            ctx.pols.record(ctx, line, op, fi_rec, extra)

        if line.cmd_after:
            for cmd in line.cmd_after:
                eval_command(ctx, cmd)

        # terminal condition.  Full mode (ctx.N > 0) runs EXACTLY N steps —
        # the ROM's own end spin (beforeLast JMPN loop) pads the trace and
        # row N-1 jumps back to row 0 (reference main_executor.cpp loop
        # bound; the trace is cyclic).  Fast mode stops at the ROM's final
        # wrap: a jump to zkPC 0 after real work, a self-jump end label
        # (hand-written test ROMs), or running off the program.
        if ctx.N:
            finished = ctx.counters.steps >= ctx.N - 1
        else:
            finished = next_zkpc == ctx.zkPC and not stayed_for_repeat
            if next_zkpc == 0 and ctx.counters.steps > 0 and \
                    "start" in (line.jmp_addr_label, line.else_addr_label):
                # only the ROM's designated final wrap (`:JMP(start)`)
                # terminates; a hand-written ROM legitimately jumping to
                # address 0 keeps executing (ADVICE r2: a bare
                # target-0 heuristic silently truncated such programs)
                finished = True
            if next_zkpc >= self.rom.size:
                finished = True
        ctx.zkPC = next_zkpc
        return finished

    # ------------------------------------------------------------------
    def _free_input(self, ctx: Context, line: RomLine, addr: int,
                    eval_command) -> List[int]:
        tag = line.free_in_tag
        if tag is not None and tag.get("op", "") != "":
            value = eval_command(ctx, tag)
            if isinstance(value, list):
                return value
            return fea8(int(value))
        # implicit sources (reference main_executor.cpp:758-1489 nHits cases)
        if line.flag("mOp") and not line.flag("mWR"):
            return list(ctx.mem.get(addr, [0] * 8))
        if line.flag("hashK") or line.flag("hashK1"):
            return self._hash_read(ctx, ctx.hash_k, line, addr,
                                   one=line.flag("hashK1"))
        if line.flag("hashP") or line.flag("hashP1"):
            return self._hash_read(ctx, ctx.hash_p, line, addr,
                                   one=line.flag("hashP1"))
        if line.flag("bin"):
            a = fea2scalar(ctx.A)
            b = fea2scalar(ctx.B)
            opc = line.bin_opcode
            if opc == 0:
                v = (a + b) & MASK256
            elif opc == 1:
                v = (a - b) & MASK256
            elif opc == 2:
                v = 1 if a < b else 0
            elif opc == 3:
                sa = a - (1 << 256) if a >> 255 else a
                sb = b - (1 << 256) if b >> 255 else b
                v = 1 if sa < sb else 0
            elif opc == 4:
                v = 1 if a == b else 0
            elif opc == 5:
                v = a & b
            elif opc == 6:
                v = a | b
            elif opc == 7:
                v = a ^ b
            else:
                raise ExecutorError("BIN", f"bad free-in binOpcode {opc}")
            return fea8(v)
        if line.flag("memAlignRD"):
            m0 = fea2scalar(ctx.A)
            m1 = fea2scalar(ctx.B)
            offset = fea2scalar(ctx.C)
            if offset < 0 or offset > 32:
                raise ExecutorError("MEMALIGN", f"bad offset {offset}")
            left_v = (m0 << (offset * 8)) & MASK256
            right_v = (m1 >> (256 - offset * 8)) & \
                (MASK256 >> (256 - offset * 8)) if offset else 0
            return fea8(left_v | right_v)
        if line.flag("sRD"):
            key = storage_key(ctx)
            root = sr8to4(ctx.SR)
            res = ctx.hashdb.get(root, key)
            ctx.counters.poseidon_g += res.proof_hash_counter
            ctx.step_inc_counter = res.proof_hash_counter + 2
            ctx.required.storage.append(res)
            if ctx.tracer is not None:
                # reference main_executor.cpp:887 eval_addReadWriteAddress
                ctx.tracer.add_read_write_address(ctx.A, ctx.B, res.value)
            return fea8(res.value)
        if line.flag("sWR"):
            key = storage_key(ctx)
            root = sr8to4(ctx.SR)
            value = fea2scalar(ctx.D)
            if ctx.tracer is not None:
                # reference main_executor.cpp:1030 eval_addReadWriteAddress
                ctx.tracer.add_read_write_address(ctx.A, ctx.B, value)
            res = ctx.hashdb.set("", 0, root, key, value)
            ctx.counters.poseidon_g += res.proof_hash_counter
            ctx.step_inc_counter = res.proof_hash_counter + 2
            ctx.counters.binary += 1  # reference cntBinary: bin|sWR|hashPDigest
            ctx.required.storage.append(res)
            return sr4to8(res.new_root)
        if line.flag("hashKDigest"):
            hs = ctx.hash_k.setdefault(addr, HashState())
            hs.digest_called = True
            # per-ROW accounting (reference main_executor.cpp:2361:
            # cntKeccakF adds ceil((len+1)/136) at every hashKDigest row)
            blocks = len(hs.data) // 136 + 1
            ctx.counters.keccak_f += blocks
            ctx.step_inc_counter = blocks
            if hs.digest is None:
                hs.digest = int.from_bytes(keccak256(bytes(hs.data)), "big")
            return fea8(hs.digest)
        if line.flag("hashPDigest"):
            hs = ctx.hash_p.setdefault(addr, HashState())
            hs.digest_called = True
            if hs.digest is None:
                self._hash_p_digest(ctx, hs)
            return fea8(hs.digest)
        raise ExecutorError(
            "FREEIN", f"no free input source at zkPC={ctx.zkPC} "
                      f"({line.line_str})"
        )

    # ------------------------------------------------------------------
    def _binary(self, ctx: Context, line: RomLine, op: List[int]):
        a = fea2scalar(ctx.A)
        b = fea2scalar(ctx.B)
        c = fea2scalar(op)
        opcode = line.bin_opcode
        carry = 0
        if opcode == 0:      # ADD
            expected = (a + b) & MASK256
            carry = 1 if a + b > MASK256 else 0
        elif opcode == 1:    # SUB
            expected = (a - b) & MASK256
            carry = 1 if a < b else 0
        elif opcode == 2:    # LT
            expected = 1 if a < b else 0
            carry = expected
        elif opcode == 3:    # SLT
            sa = a - (1 << 256) if a >> 255 else a
            sb = b - (1 << 256) if b >> 255 else b
            expected = 1 if sa < sb else 0
            carry = expected
        elif opcode == 4:    # EQ
            expected = 1 if a == b else 0
            carry = expected
        elif opcode == 5:    # AND
            expected = a & b
            carry = 1 if expected != 0 else 0
        elif opcode == 6:    # OR
            expected = a | b
            carry = 0
        elif opcode == 7:    # XOR
            expected = a ^ b
            carry = 0
        elif opcode == 8:    # LT4 (4x64-bit chunk-wise less-than)
            expected = 1
            for k in range(4):
                if ((a >> (64 * k)) & ((1 << 64) - 1)) >= \
                   ((b >> (64 * k)) & ((1 << 64) - 1)):
                    expected = 0
                    break
            carry = expected
        else:
            raise ExecutorError("BIN", f"invalid binOpcode {opcode}")
        if c != expected:
            raise ExecutorError(
                "BIN", f"binary check failed opcode={opcode} at "
                       f"zkPC={ctx.zkPC}: got {c} expected {expected}"
            )
        ctx.carry = carry
        ctx.counters.binary += 1
        ctx.required.binary.append(
            {"a": a, "b": b, "c": c, "opcode": opcode, "type": 1}
        )

    def _hash_p_digest(self, ctx: Context, hs: HashState) -> None:
        """Compute the Poseidon linear hash of a hashP stream (reference
        hashPLen/hashPDigest flow); counters account per hashPDigest ROW
        in _step, not here."""
        data = bytes(hs.data)
        felts = [int.from_bytes(data[off:off + 7], "little")
                 for off in range(0, len(data), 7)]
        digest4 = poseidon_gl.linear_hash_host(felts + [len(data)])
        hs.digest = fea2scalar(sr4to8(tuple(digest4)))
        ctx.hashdb.set_program(
            tuple((hs.digest >> (64 * i)) & ((1 << 64) - 1)
                  for i in range(4)),
            data,
        )

    def _hash_read(self, ctx: Context, table: Dict[int, HashState],
                   line: RomLine, addr: int, one: bool) -> List[int]:
        """Free-input read of `size` bytes (big-endian scalar) from a hash
        stream at HASHPOS (reference main_executor.cpp hashK free in)."""
        hs = table.setdefault(addr, HashState())
        size = 1 if one else fe_to_s32(ctx.D[0])
        if size < 0 or size > 32:
            raise ExecutorError("HASH", f"bad hash read size {size}")
        pos = ctx.HASHPOS
        if pos < 0 or pos + size > len(hs.data):
            raise ExecutorError(
                "HASH", f"hash read out of range pos={pos} size={size} "
                        f"len={len(hs.data)}"
            )
        v = int.from_bytes(bytes(hs.data[pos:pos + size]), "big")
        return fea8(v)

    def _hash_absorb(self, ctx: Context, table: Dict[int, HashState],
                     line: RomLine, op: List[int], addr: int, one: bool):
        size = 1 if one else fe_to_s32(ctx.D[0])
        if size < 0 or size > 32:
            raise ExecutorError("HASH", f"bad hash size {size}")
        hs = table.setdefault(addr, HashState())
        value = fea2scalar(op) & ((1 << (8 * size)) - 1)
        data = value.to_bytes(size, "big")
        pos = ctx.HASHPOS
        if len(hs.data) < pos + size:
            hs.data.extend(b"\x00" * (pos + size - len(hs.data)))
        hs.data[pos:pos + size] = data
        if hs.read_len.get(pos, size) != size:
            raise ExecutorError(
                "HASH", f"two different read sizes at pos {pos}")
        hs.read_len[pos] = size
        ctx.HASHPOS = pos + size

    def _arith(self, ctx: Context, line: RomLine, op: List[int]):
        """Arith instruction (reference main_executor.cpp:2697-2900):
        eq0: A*B + C = D*2^256 + op over scalars; eq1/eq2: secp256k1 EC
        point add (A,B)+(C,D)=(E,op) / double (A,B)*2=(E,op)."""
        from .eval_command import FPEC

        eq0 = line.flag("arithEq0")
        eq1 = line.flag("arithEq1")
        eq2 = line.flag("arithEq2")
        if eq0 and not eq1 and not eq2:
            a = fea2scalar(ctx.A)
            b = fea2scalar(ctx.B)
            c = fea2scalar(ctx.C)
            d = fea2scalar(ctx.D)
            o = fea2scalar(op)
            if (a * b + c) != (d << 256) + o:
                raise ExecutorError(
                    "ARITH", f"arith check failed at zkPC={ctx.zkPC}"
                )
            ctx.counters.arith += 1
            ctx.required.arith.append(
                {"x1": a, "y1": b, "x2": c, "y2": d, "x3": 0, "y3": o,
                 "selEq0": 1, "selEq1": 0, "selEq2": 0, "selEq3": 0}
            )
            return
        # EC add (eq1) or double (eq2)
        dbl = bool(eq2)
        x1 = fea2scalar(ctx.A)
        y1 = fea2scalar(ctx.B)
        x2 = x1 if dbl else fea2scalar(ctx.C)
        y2 = y1 if dbl else fea2scalar(ctx.D)
        x3 = fea2scalar(ctx.E)
        y3 = fea2scalar(op)
        if dbl:
            if y1 % FPEC == 0:
                raise ExecutorError("ARITH", "EC double of point at infinity")
            lam = 3 * x1 * x1 % FPEC * pow(2 * y1 % FPEC, FPEC - 2, FPEC) % FPEC
        else:
            dx = (x2 - x1) % FPEC
            if dx == 0:
                raise ExecutorError("ARITH", "EC add with x1 == x2")
            lam = (y2 - y1) % FPEC * pow(dx, FPEC - 2, FPEC) % FPEC
        ex3 = (lam * lam - x1 - x2) % FPEC
        ey3 = (lam * (x1 - ex3) - y1) % FPEC
        if x3 != ex3 or y3 != ey3:
            raise ExecutorError(
                "ARITH", f"EC {'dbl' if dbl else 'add'} mismatch at "
                         f"zkPC={ctx.zkPC}"
            )
        ctx.counters.arith += 1
        ctx.required.arith.append(
            {"x1": x1, "y1": y1, "x2": x2, "y2": y2, "x3": x3, "y3": y3,
             "selEq0": 0, "selEq1": 0 if dbl else 1, "selEq2": 1 if dbl else 0,
             "selEq3": 1}
        )

    def _mem_align(self, ctx: Context, line: RomLine, op: List[int]):
        """memAlignRD/WR/WR8 (reference main_executor.cpp:3327-3500)."""
        m0 = fea2scalar(ctx.A)
        m1 = fea2scalar(ctx.B)
        v = fea2scalar(op)
        offset = fea2scalar(ctx.C)
        if offset < 0 or offset > 32:
            raise ExecutorError("MEMALIGN", f"offset out of range {offset}")
        if line.flag("memAlignWR") and not line.flag("memAlignRD") and \
                not line.flag("memAlignWR8"):
            w0 = fea2scalar(ctx.D)
            w1 = fea2scalar(ctx.E)
            exp_w0 = (m0 & ((1 << 256) - (1 << (256 - offset * 8)))) | \
                (v >> (offset * 8)) if offset else v
            exp_w1 = ((m1 & (MASK256 >> (offset * 8))) |
                      ((v << (256 - offset * 8)) & MASK256)) if offset else m1
            if w0 != exp_w0 or w1 != exp_w1:
                raise ExecutorError(
                    "MEMALIGN", f"WR mismatch at zkPC={ctx.zkPC}")
            ctx.required.mem_align.append(
                {"m0": m0, "m1": m1, "w0": w0, "w1": w1, "v": v,
                 "offset": offset, "wr256": 1, "wr8": 0}
            )
        elif line.flag("memAlignWR8") and not line.flag("memAlignRD") and \
                not line.flag("memAlignWR"):
            w0 = fea2scalar(ctx.D)
            byte_mask_on_256 = int(
                "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF"
                "FFFF00FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF"
                "FFFFFFFF", 16)
            exp_w0 = (m0 & (byte_mask_on_256 >> (offset * 8))) | \
                ((v & 0xFF) << ((31 - offset) * 8))
            if w0 != exp_w0:
                raise ExecutorError(
                    "MEMALIGN", f"WR8 mismatch at zkPC={ctx.zkPC}")
            ctx.required.mem_align.append(
                {"m0": m0, "m1": 0, "w0": w0, "w1": 0, "v": v,
                 "offset": offset, "wr256": 0, "wr8": 1}
            )
        elif line.flag("memAlignRD") and not line.flag("memAlignWR") and \
                not line.flag("memAlignWR8"):
            left_v = (m0 << (offset * 8)) & MASK256
            right_v = (m1 >> (256 - offset * 8)) & \
                (MASK256 >> (256 - offset * 8)) if offset else 0
            if v != (left_v | right_v):
                raise ExecutorError(
                    "MEMALIGN", f"RD mismatch at zkPC={ctx.zkPC}")
            ctx.required.mem_align.append(
                {"m0": m0, "m1": m1, "w0": 0, "w1": 0, "v": v,
                 "offset": offset, "wr256": 0, "wr8": 0}
            )
        else:
            raise ExecutorError("MEMALIGN", "invalid memAlign operation")
        ctx.counters.mem_align += 1

"""Expression-program VM: constraint evaluation as ONE lax.scan.

This is the TPU rendering of the reference's bytecode-interpreter
("parser") form of its generated constraint evaluators — a switch over
op/args arrays batched across rows (reference
zkevm.chelpers.step3.parser.cpp:11-60) — chosen over unrolled code for
exactly the reason the reference offers it: the unrolled form does not
scale.  On TPU the scaling wall is the XLA compiler (super-linear in
graph size: ~300 fused field muls compile in ~11 s on v5e, ~500 take
minutes; the zkEVM's 30k-node step4 program is hours as bounded chunks,
unbuildable whole), so the program becomes DATA:

  * instructions: (opcode, a, b, dst) int32 rows scanned by a small
    fixed loop body — compile cost is O(1) in program length;
  * a (R, 3, n) GL3 register file in HBM; linear-scan register
    allocation (structural-hash CSE, last-use recycling) keeps R small;
    program dests are pinned so step outputs survive the scan;
  * section columns arrive TRANSPOSED (W, n): a LOAD/LOADR (rotated)
    gathers one felt row by dynamic index, so the gather is contiguous;
  * scalars (literals, challenge components, publics, evals, and every
    scalar-only subexpression) live in a small (L, 3) constant table —
    derived entries are evaluated once per run with O(L) scalar ops —
    and fold into ADDC/SUBC/CSUBC/MULC instruction forms instead of
    wasting (3, n) register rows.

Everything is GL3 (base values ride with c1 = c2 = 0): a uniform opcode
set beats per-dim specialization because the scan body must be one
graph.  The ~3x arithmetic overhead on base-field ops costs
milliseconds per proof; the win is minutes-vs-hours of compile.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import goldilocks3 as gl3
from ..ops.goldilocks import GL, P
from ..ops.goldilocks3 import GL3
from .air import Expr

# opcodes (order matters: run_program's switch indexes by these)
ADD, SUB, MUL, ADDC, SUBC, CSUBC, MULC, NEG, LOAD, LOADR, LOADC = range(11)

_SCALAR_LEAVES = ("challenge", "public", "number", "eval")


@dataclass
class VMProgram:
    """Compiled expression program (host-side static data)."""

    n_regs: int
    code: np.ndarray                     # (Ni, 4) int32: opcode, a, b, dst
    # constant table: ('leaf', key) | ('op', kind, i, j) entries, in
    # evaluation order (derived entries only reference earlier ones)
    consts: List[Tuple]
    # vector preloads: (reg, 'x' | 'Zi' | 'xDivXSubXi' | 'xDivXSubWXi')
    preload: List[Tuple[int, str]]
    out_regs: Dict[Tuple, int]           # dest -> register
    sections: List[str]                  # LOAD section index order


def compile_program(
    prog: Sequence[Tuple[Tuple, Expr]],
    info,
    domain: str,
    section_names: List[str],
) -> VMProgram:
    """Lower (dest, Expr) pairs to VM code with structural-hash CSE.

    cm leaves whose id is an earlier dest in THIS program read the
    dest's pinned register (the evaluator's pending_cm semantics)."""
    sec_idx = {s: i for i, s in enumerate(section_names)}

    # ---- structural postorder + refcounts ----
    order: List[Expr] = []
    index: Dict[Expr, int] = {}

    def walk(e: Expr):
        if e in index:
            return
        for a in e.args:
            walk(a)
        index[e] = len(order)
        order.append(e)

    items = list(prog)
    for _dest, e in items:
        walk(e)

    refcount: Dict[Expr, int] = {}
    for e in order:
        for a in e.args:
            refcount[a] = refcount.get(a, 0) + 1
    pinned: set = {e for _d, e in items}

    # ---- scalar classification (const-table candidates) ----
    is_scalar: Dict[Expr, bool] = {}
    for e in order:
        if e.kind in _SCALAR_LEAVES:
            is_scalar[e] = True
        elif e.kind in ("add", "sub", "mul", "neg"):
            is_scalar[e] = all(is_scalar[a] for a in e.args)
        else:
            is_scalar[e] = False

    consts: List[Tuple] = []
    const_at: Dict = {}

    def const_entry(e: Expr) -> int:
        key = e
        if key in const_at:
            return const_at[key]
        if e.kind in _SCALAR_LEAVES:
            ent = ("leaf", e.kind,
                   e.value if e.kind == "number" else e.id)
        else:
            args = [const_entry(a) for a in e.args]
            ent = ("op", e.kind, args[0],
                   args[1] if len(args) > 1 else -1)
        idx = len(consts)
        consts.append(ent)
        const_at[key] = idx
        return idx

    # ---- register allocation ----
    code: List[Tuple[int, int, int, int]] = []
    node_reg: Dict[Expr, int] = {}
    protected: set = set()               # regs never recycled
    free_regs: List[int] = []
    n_regs = 0
    dest_reg: Dict[int, int] = {}        # cm id -> pinned reg of dest
    released: Dict[Expr, int] = {}

    def alloc() -> int:
        nonlocal n_regs
        if free_regs:
            return free_regs.pop()
        r = n_regs
        n_regs += 1
        return r

    def release(a: Expr):
        released[a] = released.get(a, 0) + 1
        if released[a] == refcount.get(a, 0) and a not in pinned:
            r = node_reg.get(a)
            if r is not None and r not in protected:
                free_regs.append(r)

    preload: List[Tuple[int, str]] = []
    preload_at: Dict[str, int] = {}

    def load_instr(e: Expr) -> Tuple[int, int, int]:
        """(opcode, a, b) for a section-column load."""
        if e.kind == "const":
            sec, pos, dim = "const", e.id, 1
        else:
            pid = info.qs[e.id] if e.kind == "q" else e.id
            pm = info.cm_pols[pid]
            sec = pm.section
            if domain == "ext" and sec != "cm4_2ns":
                sec = sec.replace("_n", "_2ns")
            pos, dim = pm.section_pos, pm.dim
        if sec not in sec_idx:
            raise KeyError(
                f"{e.kind}{e.id} lives in section {sec!r} which is not an "
                f"input of this program (pending dest not rewritten?)")
        return (LOADR if e.prime else LOAD, sec_idx[sec], (pos << 2) | dim)

    def resolve(a: Expr) -> Tuple[int, bool]:
        """Operand register for `a`; bool = temp (release after use).

        Section loads are NOT CSEd into long-lived registers: a column
        shared by distant expressions would pin a (3, n) row for the
        whole scan and R would track the ~1900 distinct columns (24 GB
        at 2^19).  Reloading per use is one cheap gather."""
        if a in node_reg:
            return node_reg[a], False
        if a.kind in ("x", "Zi", "xDivXSubXi", "xDivXSubWXi"):
            return vector_leaf_reg(a), False
        if a.kind in ("cm", "const", "q", "tmpexp"):
            opc, sa, sb = load_instr(a)
            r = alloc()
            code.append((opc, sa, sb, r))
            return r, True
        raise ValueError(a.kind)

    def vector_leaf_reg(e: Expr) -> int:
        if e.kind not in preload_at:
            # preloads are written BEFORE the scan: they must take a
            # FRESH register number, never one recycled from an earlier
            # temp (an in-scan write to that slot would clobber them)
            nonlocal n_regs
            r = n_regs
            n_regs += 1
            protected.add(r)
            preload_at[e.kind] = r
            preload.append((r, e.kind))
        return preload_at[e.kind]

    def free_temp(r: int):
        if r not in protected:
            free_regs.append(r)

    for e in order:
        k = e.kind
        if is_scalar[e]:
            continue                      # materializes lazily via C-forms
        if k in ("x", "Zi", "xDivXSubXi", "xDivXSubWXi",
                 "cm", "const", "q", "tmpexp"):
            continue                      # resolved per use
        if k == "neg":
            (a,) = e.args
            ra, ta = resolve(a)
            r = alloc()
            code.append((NEG, ra, 0, r))
            if ta:
                free_temp(ra)
            else:
                release(a)
            node_reg[e] = r
        elif k in ("add", "sub", "mul"):
            a, b = e.args
            sa, sb = is_scalar[a], is_scalar[b]
            if not sa and not sb:
                ra, ta = resolve(a)
                rb, tb = resolve(b)
                r = alloc()
                opc = {"add": ADD, "sub": SUB, "mul": MUL}[k]
                code.append((opc, ra, rb, r))
                for (rr, tt, aa) in ((ra, ta, a), (rb, tb, b)):
                    if tt:
                        free_temp(rr)
                    else:
                        release(aa)
            elif sb:
                ra, ta = resolve(a)
                r = alloc()
                c = const_entry(b)
                opc = {"add": ADDC, "sub": SUBC, "mul": MULC}[k]
                code.append((opc, ra, c, r))
                if ta:
                    free_temp(ra)
                else:
                    release(a)
            else:  # sa and not sb
                rb, tb = resolve(b)
                r = alloc()
                c = const_entry(a)
                if k == "sub":
                    code.append((CSUBC, rb, c, r))
                else:
                    opc = {"add": ADDC, "mul": MULC}[k]
                    code.append((opc, rb, c, r))
                if tb:
                    free_temp(rb)
                else:
                    release(b)
            node_reg[e] = r
        else:
            raise ValueError(k)

    # pin + register outputs (scalar dests get a LOADC materialization;
    # bare-column dests get their own LOAD)
    out_regs: Dict[Tuple, int] = {}
    for dest, e in items:
        if e not in node_reg:
            if is_scalar[e]:
                r = alloc()
                code.append((LOADC, const_entry(e), 0, r))
            else:
                r, _tmp = resolve(e)
            node_reg[e] = r
        r = node_reg[e]
        protected.add(r)
        out_regs[dest] = r
        if dest[0] == "cm":
            dest_reg[dest[1]] = r

    return VMProgram(
        n_regs=n_regs,
        code=np.array(code, dtype=np.int32).reshape(-1, 4),
        consts=consts,
        preload=preload,
        out_regs=out_regs,
        sections=list(section_names),
    )


def compile_program_ordered(
    prog: Sequence[Tuple[Tuple, Expr]],
    info,
    domain: str,
    section_names: List[str],
) -> VMProgram:
    """Order-aware variant: dest i's register is visible to items > i
    (pending-cm semantics).  Implemented by rewriting later items' cm
    leaves onto the dest expressions before one-shot compilation —
    structural CSE then collapses the reads onto the dest's register."""
    produced: Dict[int, Expr] = {}
    rewritten: List[Tuple[Tuple, Expr]] = []
    memo: Dict[Expr, Expr] = {}

    def subst(e: Expr) -> Expr:
        if e.kind == "cm" and e.id in produced and not e.prime:
            return produced[e.id]
        if not e.args:
            return e
        hit = memo.get(e)
        if hit is not None:
            return hit
        out = Expr(e.kind, id=e.id, prime=e.prime, value=e.value,
                   args=tuple(subst(a) for a in e.args))
        memo[e] = out
        return out

    for dest, e in prog:
        e2 = subst(e)
        rewritten.append((dest, e2))
        if dest[0] == "cm":
            produced[dest[1]] = e2
            memo = {}
    return compile_program(rewritten, info, domain, section_names)


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------


def _c3(lo, hi) -> GL3:
    return GL3(GL(lo[0], hi[0]), GL(lo[1], hi[1]), GL(lo[2], hi[2]))


def _m3(v: GL3):
    return (jnp.stack([v.c0.lo, v.c1.lo, v.c2.lo]),
            jnp.stack([v.c0.hi, v.c1.hi, v.c2.hi]))


def build_const_table(vm: VMProgram, challenges: Optional[GL3],
                      publics: Optional[GL], evals: Optional[GL3]):
    """(L, 3) lo/hi uint32 scalar table (derived entries evaluated with
    O(L) scalar ops; L is tens-to-hundreds)."""
    rows_lo: List[jnp.ndarray] = []
    rows_hi: List[jnp.ndarray] = []

    def row_of(i: int) -> GL3:
        return GL3(GL(rows_lo[i][0], rows_hi[i][0]),
                   GL(rows_lo[i][1], rows_hi[i][1]),
                   GL(rows_lo[i][2], rows_hi[i][2]))

    for ent in vm.consts:
        if ent[0] == "leaf":
            _tag, kind, idv = ent
            if kind == "number":
                v = gl3.const(idv % P)
            elif kind == "challenge":
                v = challenges[idv]
            elif kind == "public":
                v = gl3.from_base(publics[idv])
            else:  # eval
                v = evals[idv]
        else:
            _tag, kind, i, j = ent
            if kind == "neg":
                v = gl3.neg(row_of(i))
            else:
                fa, fb = row_of(i), row_of(j)
                v = {"add": gl3.add, "sub": gl3.sub,
                     "mul": gl3.mul}[kind](fa, fb)
        lo, hi = _m3(v)
        rows_lo.append(lo.reshape(3))
        rows_hi.append(hi.reshape(3))
    if not rows_lo:
        return (jnp.zeros((1, 3), jnp.uint32), jnp.zeros((1, 3), jnp.uint32))
    return jnp.stack(rows_lo), jnp.stack(rows_hi)


def run_program(
    vm: VMProgram,
    info,
    sections_t: Dict[str, GL],           # TRANSPOSED (W, n) matrices
    n: int,
    challenges: Optional[GL3] = None,
    publics: Optional[GL] = None,
    x: Optional[GL] = None,
    zi: Optional[GL] = None,
    evals: Optional[GL3] = None,
    x_div_x_sub_xi: Optional[GL3] = None,
    x_div_x_sub_wxi: Optional[GL3] = None,
    roll_k: int = 1,
) -> Dict[Tuple, GL3]:
    """Execute; returns dest -> (n,) GL3 values."""
    R = vm.n_regs
    regs_lo = jnp.zeros((R, 3, n), jnp.uint32)
    regs_hi = jnp.zeros((R, 3, n), jnp.uint32)

    vec = {"x": x, "Zi": zi, "xDivXSubXi": x_div_x_sub_xi,
           "xDivXSubWXi": x_div_x_sub_wxi}
    for r, kind in vm.preload:
        v = vec[kind]
        if isinstance(v, GL):
            v = gl3.from_base(v)
        lo, hi = _m3(GL3(
            GL(jnp.broadcast_to(v.c0.lo, (n,)),
               jnp.broadcast_to(v.c0.hi, (n,))),
            GL(jnp.broadcast_to(v.c1.lo, (n,)),
               jnp.broadcast_to(v.c1.hi, (n,))),
            GL(jnp.broadcast_to(v.c2.lo, (n,)),
               jnp.broadcast_to(v.c2.hi, (n,))),
        ))
        regs_lo = regs_lo.at[r].set(lo)
        regs_hi = regs_hi.at[r].set(hi)

    tab_lo, tab_hi = build_const_table(vm, challenges, publics, evals)
    sec_mats = [sections_t[s] for s in vm.sections]

    def gather_reg(lo, hi, r):
        return (jax.lax.dynamic_slice_in_dim(lo, r, 1, 0)[0],
                jax.lax.dynamic_slice_in_dim(hi, r, 1, 0)[0])

    def gather_const(c):
        row_lo = jax.lax.dynamic_slice_in_dim(tab_lo, c, 1, 0)[0]
        row_hi = jax.lax.dynamic_slice_in_dim(tab_hi, c, 1, 0)[0]
        return GL3(GL(row_lo[0], row_hi[0]), GL(row_lo[1], row_hi[1]),
                   GL(row_lo[2], row_hi[2]))

    def load_col(sec_id, poscode, rot):
        pos = poscode >> 2
        dim = poscode & 3

        def mk(i):
            def f(_):
                m = sec_mats[i]
                r0l = jax.lax.dynamic_slice_in_dim(m.lo, pos, 1, 0)[0]
                r0h = jax.lax.dynamic_slice_in_dim(m.hi, pos, 1, 0)[0]

                def full3(_):
                    r1l = jax.lax.dynamic_slice_in_dim(
                        m.lo, pos + 1, 1, 0)[0]
                    r1h = jax.lax.dynamic_slice_in_dim(
                        m.hi, pos + 1, 1, 0)[0]
                    r2l = jax.lax.dynamic_slice_in_dim(
                        m.lo, pos + 2, 1, 0)[0]
                    r2h = jax.lax.dynamic_slice_in_dim(
                        m.hi, pos + 2, 1, 0)[0]
                    return (jnp.stack([r0l, r1l, r2l]),
                            jnp.stack([r0h, r1h, r2h]))

                def base1(_):
                    z = jnp.zeros_like(r0l)
                    return (jnp.stack([r0l, z, z]),
                            jnp.stack([r0h, z, z]))

                return jax.lax.cond(dim == 3, full3, base1, None)
            return f

        lo, hi = jax.lax.switch(sec_id, [mk(i) for i in range(len(sec_mats))],
                                None)
        lo = jnp.where(rot, jnp.roll(lo, -roll_k, axis=1), lo)
        hi = jnp.where(rot, jnp.roll(hi, -roll_k, axis=1), hi)
        return lo, hi

    def body(carry, instr):
        lo, hi = carry
        opc, a, b, dst = instr[0], instr[1], instr[2], instr[3]

        def f_add(_):
            va = _c3(*gather_reg(lo, hi, a))
            vb = _c3(*gather_reg(lo, hi, b))
            return _m3(gl3.add(va, vb))

        def f_sub(_):
            va = _c3(*gather_reg(lo, hi, a))
            vb = _c3(*gather_reg(lo, hi, b))
            return _m3(gl3.sub(va, vb))

        def f_mul(_):
            va = _c3(*gather_reg(lo, hi, a))
            vb = _c3(*gather_reg(lo, hi, b))
            return _m3(gl3.mul(va, vb))

        def f_addc(_):
            va = _c3(*gather_reg(lo, hi, a))
            return _m3(gl3.add(va, gather_const(b)))

        def f_subc(_):
            va = _c3(*gather_reg(lo, hi, a))
            return _m3(gl3.sub(va, gather_const(b)))

        def f_csubc(_):
            va = _c3(*gather_reg(lo, hi, a))
            return _m3(gl3.sub(gather_const(b), va))

        def f_mulc(_):
            va = _c3(*gather_reg(lo, hi, a))
            return _m3(gl3.mul(va, gather_const(b)))

        def f_neg(_):
            va = _c3(*gather_reg(lo, hi, a))
            return _m3(gl3.neg(va))

        def f_load(_):
            return load_col(a, b, False)

        def f_loadr(_):
            return load_col(a, b, True)

        def f_loadc(_):
            v = gather_const(a)
            return _m3(GL3(
                GL(jnp.broadcast_to(v.c0.lo, (n,)),
                   jnp.broadcast_to(v.c0.hi, (n,))),
                GL(jnp.broadcast_to(v.c1.lo, (n,)),
                   jnp.broadcast_to(v.c1.hi, (n,))),
                GL(jnp.broadcast_to(v.c2.lo, (n,)),
                   jnp.broadcast_to(v.c2.hi, (n,))),
            ))

        vl, vh = jax.lax.switch(
            opc, [f_add, f_sub, f_mul, f_addc, f_subc, f_csubc, f_mulc,
                  f_neg, f_load, f_loadr, f_loadc], None)
        lo = jax.lax.dynamic_update_slice_in_dim(lo, vl[None], dst, 0)
        hi = jax.lax.dynamic_update_slice_in_dim(hi, vh[None], dst, 0)
        return (lo, hi), None

    (regs_lo, regs_hi), _ = jax.lax.scan(
        body, (regs_lo, regs_hi), jnp.asarray(vm.code))

    return {dest: _c3(regs_lo[r], regs_hi[r])
            for dest, r in vm.out_regs.items()}

"""Pure device-side STARK stage functions (jit-compiled once per circuit).

Each function is a pure map from device arrays to device arrays, with the
circuit's StarkInfo closed over as a static constant — the host prover
(prover.py) interleaves them with the sequential Fiat-Shamir transcript,
and the multi-chip dry-run composes them under one jit with mesh sharding
constraints (the reference's per-stage structure, starks.cpp:9-403, with
the host/device split at exactly the transcript interactions).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import goldilocks3 as gl3
from ..ops import ntt as nttmod
from ..ops import poseidon_gl
from ..ops.goldilocks import GL, P, SHIFT
from ..ops.goldilocks3 import GL3
from .compiler import StarkInfo
from .evaluator import (
    BARRIER_EVERY,
    EvalContext,
    eval_expr,
    eval_program,
    normalize,
)
from .plookup import calculate_h1h2, calculate_z


def _assemble_section(rows: int, width: int, cols: Dict[int, object],
                      info: StarkInfo, section: str) -> GL:
    lo = jnp.zeros((rows, width), jnp.uint32)
    hi = jnp.zeros((rows, width), jnp.uint32)
    for pid, val in cols.items():
        pm = info.cm_pols[pid]
        assert pm.section == section
        if pm.dim == 3 and not isinstance(val, GL3):
            val = gl3.from_base(val)
        pos = pm.section_pos
        if pm.dim == 1:
            lo = lo.at[:, pos].set(val.lo)
            hi = hi.at[:, pos].set(val.hi)
        else:
            lo = lo.at[:, pos].set(val.c0.lo).at[:, pos + 1].set(val.c1.lo)
            lo = lo.at[:, pos + 2].set(val.c2.lo)
            hi = hi.at[:, pos].set(val.c0.hi).at[:, pos + 1].set(val.c1.hi)
            hi = hi.at[:, pos + 2].set(val.c2.hi)
    return GL(lo, hi)


def _gl3_to_mat(v: GL3) -> GL:
    return GL(
        jnp.stack([v.c0.lo, v.c1.lo, v.c2.lo], axis=1),
        jnp.stack([v.c0.hi, v.c1.hi, v.c2.hi], axis=1),
    )


def _mat_to_gl3(m: GL) -> GL3:
    return GL3(
        GL(m.lo[:, 0], m.hi[:, 0]),
        GL(m.lo[:, 1], m.hi[:, 1]),
        GL(m.lo[:, 2], m.hi[:, 2]),
    )


def extend_section(info: StarkInfo, section_n: GL) -> GL:
    """LDE of an n-domain section (tree built separately via the
    shape-cached merkelize so upper levels compile once per height)."""
    n_ext = info.n_ext
    if section_n.shape[1] == 0:
        return gl.zeros((n_ext, 0))
    return nttmod.extend_pol(section_n, info.n_bits, info.n_bits_ext)


def step2_compute(info: StarkInfo, sections: Dict[str, GL], const_n: GL,
                  challenges: GL3, publics: GL, x_n: GL
                  ) -> Tuple[GL, jnp.ndarray]:
    """f/t expressions + plookup h1/h2 -> cm2_n section and ok flags."""
    ctx = EvalContext(info=info, domain="n", sections=sections, const=const_n,
                      challenges=challenges, publics=publics, x=x_n)
    exp_vals = eval_program(info.step2prev, ctx)
    cm2_cols: Dict[int, object] = {}
    oks = []
    for pu in info.pu_ctx:
        h1, h2, ok = calculate_h1h2(
            exp_vals[("exp", pu.f_exp_id)], exp_vals[("exp", pu.t_exp_id)]
        )
        oks.append(ok)
        cm2_cols[pu.h1_id] = h1
        cm2_cols[pu.h2_id] = h2
    w2 = info.section_widths["cm2_n"]
    cm2_n = _assemble_section(info.n, w2, cm2_cols, info, "cm2_n")
    ok_all = jnp.all(jnp.array(oks)) if oks else jnp.array(True)
    return cm2_n, ok_all


def step3_compute(info: StarkInfo, sections: Dict[str, GL], const_n: GL,
                  challenges: GL3, publics: GL, x_n: GL) -> GL:
    """num/den im pols + grand products -> cm3_n section."""
    ctx = EvalContext(info=info, domain="n", sections=sections, const=const_n,
                      challenges=challenges, publics=publics, x=x_n)
    numden = eval_program(info.step3prev, ctx)

    def _as3(v):
        return v if isinstance(v, GL3) else gl3.from_base(v)

    cm3_cols: Dict[int, object] = {}
    for ctxs in (info.pu_ctx, info.pe_ctx, info.ci_ctx):
        for c in ctxs:
            num = _as3(numden[("cm", c.num_id)])
            den = _as3(numden[("cm", c.den_id)])
            # wide-connection partial products (compiler CiCtx.im_ids)
            for imid in getattr(c, "im_ids", []):
                cm3_cols[imid] = _as3(numden[("cm", imid)])
            cm3_cols[c.num_id] = num
            cm3_cols[c.den_id] = den
            cm3_cols[c.z_id] = calculate_z(num, den)
    w3 = info.section_widths["cm3_n"]
    return _assemble_section(info.n, w3, cm3_cols, info, "cm3_n")


def step4_chunk(info: StarkInfo, k0: int, k1: int, sections: Dict[str, GL],
                const_2ns: GL, challenges: GL3, publics: GL, x_2ns: GL,
                zi: GL, acc: GL3) -> GL3:
    """Horner-accumulate constraints [k0, k1) into the alpha-combined
    quotient numerator: acc' = acc * alpha^(k1-k0) + sum alpha^i c_i.

    The zkEVM circuit's 631 constraints at 2^19 rows cannot be stacked
    in one graph (631 x 12.6 MB GL3 vectors ~ 8 GB); constraint batches
    evaluate in separate jits with a fresh memo each, the running
    accumulator carried across (same Horner order as the verifier's
    c_exp tree)."""
    n_ext = info.n_ext
    ctx = EvalContext(info=info, domain="ext", sections=sections,
                      const=const_2ns, challenges=challenges, publics=publics,
                      x=x_2ns, zi=zi, barrier_every=BARRIER_EVERY)
    prog = info.step42ns[k0:k1]
    cvals = eval_program(prog, ctx)
    alpha = challenges[4]
    for k in range(k0, k1):
        c = cvals[("cstr", k)]
        if not isinstance(c, GL3):
            c = gl3.from_base(c)
        acc = gl3.add(gl3.mul(acc, alpha), c)
    return acc


def step4_finalize(info: StarkInfo, q_val: GL3, zi: GL) -> GL:
    """q = numerator * Zi -> INTT -> q_deg coefficient chunks -> NTT."""
    n, n_ext = info.n, info.n_ext
    q_val = gl3.mul_base(q_val, zi)
    d = nttmod.intt(_gl3_to_mat(q_val))
    shift_in = pow(pow(SHIFT, P - 2, P), n, P)
    cols_lo, cols_hi = [], []
    for p_i in range(info.q_deg):
        chunk = GL(d.lo[p_i * n: (p_i + 1) * n], d.hi[p_i * n: (p_i + 1) * n])
        chunk = gl.mul(chunk, gl.const(pow(shift_in, p_i, P)))
        pad = ((0, n_ext - n), (0, 0))
        cols_lo.append(jnp.pad(chunk.lo, pad))
        cols_hi.append(jnp.pad(chunk.hi, pad))
    q_coeffs = GL(jnp.concatenate(cols_lo, axis=1),
                  jnp.concatenate(cols_hi, axis=1))
    return nttmod.ntt(q_coeffs)


# Stacking threshold for the compact scan paths: a (K, n_ext) GL3 stack is
# K * n_ext * 24 bytes; beyond this the streamed Horner loops (fresh memo,
# one term live at a time) take over.  The zkEVM's 631 constraints at 2^19
# are ~7.9 GB stacked -> streamed; the smoke/recursion circuits are a few
# MB -> one compact lax.scan (small graphs, fast XLA compiles).
_STACK_BYTES_LIMIT = 256 << 20


def step4_compute(info: StarkInfo, sections: Dict[str, GL], const_2ns: GL,
                  challenges: GL3, publics: GL, x_2ns: GL, zi: GL) -> GL:
    """Quotient on the ext domain in one graph.  Small circuits stack the
    constraint vectors and alpha-combine with a lax.scan (compact graph —
    the multi-chip dry-run and recursion circuits compile in seconds);
    large ones fall back to the chunked streaming of step4_chunk (the
    production route in StarkProver.prove)."""
    K = len(info.constraints)
    if K * info.n_ext * 24 <= _STACK_BYTES_LIMIT:
        ctx = EvalContext(info=info, domain="ext", sections=sections,
                          const=const_2ns, challenges=challenges,
                          publics=publics, x=x_2ns, zi=zi)
        cvals = eval_program(info.step42ns, ctx)
        stacked = gl3.stack(
            [cvals[("cstr", k)] if isinstance(cvals[("cstr", k)], GL3)
             else gl3.from_base(cvals[("cstr", k)]) for k in range(K)],
            axis=0)
        alpha = challenges[4]

        def body(acc, c):
            return gl3.add(gl3.mul(acc, alpha), c), None

        q_val, _ = jax.lax.scan(body, gl3.zeros((info.n_ext,)), stacked)
        return step4_finalize(info, q_val, zi)
    acc = step4_chunk(info, 0, K, sections, const_2ns,
                      challenges, publics, x_2ns, zi,
                      gl3.zeros((info.n_ext,)))
    return step4_finalize(info, acc, zi)


def ev_pol_values(info: StarkInfo, kind: str, pid: int,
                  sections: Dict[str, GL], const_2ns: GL):
    blow = 1 << info.blowup_bits
    if kind == "const":
        return GL(const_2ns.lo[::blow, pid], const_2ns.hi[::blow, pid])
    pm = info.cm_pols[info.qs[pid] if kind == "q" else pid]
    section = pm.section if pm.section == "cm4_2ns" else \
        pm.section.replace("_n", "_2ns")
    mat = sections[section]
    pos = pm.section_pos
    if pm.dim == 1:
        return GL(mat.lo[::blow, pos], mat.hi[::blow, pos])
    return GL3(
        GL(mat.lo[::blow, pos], mat.hi[::blow, pos]),
        GL(mat.lo[::blow, pos + 1], mat.hi[::blow, pos + 1]),
        GL(mat.lo[::blow, pos + 2], mat.hi[::blow, pos + 2]),
    )


def _intt3(v: GL3) -> GL3:
    return _mat_to_gl3(nttmod.intt(_gl3_to_mat(v)))


def step5_evals(info: StarkInfo, sections: Dict[str, GL], const_2ns: GL,
                xi: GL3) -> GL3:
    """The evaluation map: evals[k] = p_k(xi or w*xi).  Returns (size_eval,).

    evmap as an inner-product against INTT'd power vectors — the reference's
    matrix-vector formulation (starks.cpp:555-668) with the dot products as
    log-depth tree reductions.
    """
    n = info.n
    shift_inv = gl.const(pow(SHIFT, P - 2, P))
    w_n = gl.const(gl.w(info.n_bits))
    xis = gl3.mul_base(xi, shift_inv)
    wxis = gl3.mul_base(gl3.mul_base(xi, w_n), shift_inv)
    lev_c = _intt3(gl3.powers_scan(xis, n))
    lpev_c = _intt3(gl3.powers_scan(wxis, n))
    out: List[GL3] = []
    for (kind, pid, prime) in info.ev_map:
        vals = ev_pol_values(info, kind, pid, sections, const_2ns)
        lcoef = lpev_c if prime else lev_c
        if isinstance(vals, GL3):
            prod = gl3.mul(vals, lcoef)
        else:
            prod = gl3.mul_base(lcoef, vals)
        out.append(gl3.sum_axis0(prod))
    return gl3.stack(out, axis=0)


def x_div_x_sub(x_2ns: GL, point: GL3) -> GL3:
    nc1 = gl.neg(point.c1)
    nc2 = gl.neg(point.c2)
    diff = GL3(
        gl.sub(x_2ns, point.c0),
        GL(jnp.broadcast_to(nc1.lo, x_2ns.shape),
           jnp.broadcast_to(nc1.hi, x_2ns.shape)),
        GL(jnp.broadcast_to(nc2.lo, x_2ns.shape),
           jnp.broadcast_to(nc2.hi, x_2ns.shape)),
    )
    return gl3.mul_base(gl3.batch_inverse_parallel(diff), x_2ns)


def step5_fri_pol(info: StarkInfo, sections: Dict[str, GL], const_2ns: GL,
                  challenges: GL3, publics: GL, x_2ns: GL, zi: GL,
                  evals: GL3, xi: GL3) -> GL3:
    n_ext = info.n_ext
    w_n = gl.const(gl.w(info.n_bits))
    wxi = gl3.mul_base(xi, w_n)
    xdiv = x_div_x_sub(x_2ns, xi)
    xdivw = x_div_x_sub(x_2ns, wxi)
    ctx = EvalContext(info=info, domain="ext", sections=sections,
                      const=const_2ns, challenges=challenges, publics=publics,
                      x=x_2ns, zi=zi, evals=evals,
                      x_div_x_sub_xi=xdiv, x_div_x_sub_wxi=xdivw)
    v1 = challenges[5]
    v2 = challenges[6]
    if len(info.ev_map) * n_ext * 24 <= _STACK_BYTES_LIMIT:
        # compact path: shared-memo program + stacked lax.scan Horner
        # folds — small graphs for small circuits (dry-run, recursion)
        terms = eval_program(info.step52ns, ctx)

        def combine(idxs) -> Optional[GL3]:
            if not idxs:
                return None
            stacked = gl3.stack(
                [terms[("fterm", k)] if isinstance(terms[("fterm", k)], GL3)
                 else gl3.from_base(terms[("fterm", k)]) for k in idxs],
                axis=0)

            def body(acc, t):
                return gl3.add(gl3.mul(acc, v1), t), None

            acc, _ = jax.lax.scan(body, gl3.zeros((n_ext,)), stacked)
            return acc

        plain = [k for k, (_, _, pr) in enumerate(info.ev_map) if not pr]
        primed = [k for k, (_, _, pr) in enumerate(info.ev_map) if pr]
        f_val = gl3.mul(combine(plain), xdiv)
        acc_w = combine(primed)
        if acc_w is not None:
            f_val = gl3.add(f_val, gl3.mul(gl3.mul(acc_w, v2), xdivw))
        return f_val
    # stream the Horner folds term-by-term: the zkEVM's ~1200-entry evmap
    # cannot be stacked ((size_eval, 2^19) GL3 ~ 15 GB); each term is
    # evaluated, folded into its accumulator, and freed (memory plan)
    prog = {dest[1]: expr for dest, expr in info.step52ns}
    acc_p: Optional[GL3] = None
    acc_w: Optional[GL3] = None
    for k, (_, _, pr) in enumerate(info.ev_map):
        # fresh memo per term: a shared one would pin every term's
        # vector (the exact blow-up this streaming avoids)
        t = eval_expr(prog[k], ctx, {})
        if not isinstance(t, GL3):
            t = gl3.from_base(t)
        if pr:
            acc_w = t if acc_w is None else gl3.add(gl3.mul(acc_w, v1), t)
        else:
            acc_p = t if acc_p is None else gl3.add(gl3.mul(acc_p, v1), t)
    f_val = gl3.mul(acc_p, xdiv)
    if acc_w is not None:
        f_val = gl3.add(f_val, gl3.mul(gl3.mul(acc_w, v2), xdivw))
    return f_val


# ===========================================================================
# Staged stage functions — bounded-compile formulation for large circuits.
#
# XLA:TPU's fusion pass cost grows super-linearly with fusion-group size
# (measured on v5e: ~100 fused field muls compile in seconds, ~400 in
# minutes; the zkEVM's 23k-node step3 program OOM-killed the compiler).
# The production path therefore never hands XLA a program-sized graph:
#
#   * expression programs evaluate in node-count-bounded chunks with
#     periodic optimization_barriers (evaluator.BARRIER_EVERY) capping
#     each fusion group;
#   * the plookup h1/h2 sort and grand-product z kernels are jitted ONCE
#     per (dim, shape) and reused across all 48 arguments — the shapes
#     agree, so 28 lookups cost two sort compiles, not twenty-eight;
#   * the evaluation map and FRI polynomial become weighted column-sum
#     kernels (gather + broadcast-mul + log-depth sum) instead of
#     1859-term unrolled Horner chains — the reference's own matrix
#     formulation of evmap (starks.cpp:555-668).
#
# This is the TPU analogue of the reference's decision to *interpret*
# constraint bytecode (zkevm.chelpers.step3.parser.cpp) rather than
# compile 306k generated lines into one translation unit.
# ===========================================================================


def _expr_new_nodes(e, seen: set) -> int:
    """Count nodes of `e` not already in `seen` (adds them)."""
    stack = [e]
    n = 0
    while stack:
        x = stack.pop()
        if id(x) in seen:
            continue
        seen.add(id(x))
        n += 1
        stack.extend(x.args)
    return n


def plan_program_chunks(prog, max_nodes: int):
    """Split a step program into [e0, e1) spans whose per-chunk (fresh
    memo) node counts stay <= max_nodes (single oversized entries get
    their own span)."""
    spans = []
    e0 = 0
    seen: set = set()
    count = 0
    for i, (_dest, expr) in enumerate(prog):
        c = _expr_new_nodes(expr, seen)
        if count and count + c > max_nodes:
            spans.append((e0, i))
            e0 = i
            seen = set()
            count = _expr_new_nodes(expr, seen)
        else:
            count += c
    if e0 < len(prog):
        spans.append((e0, len(prog)))
    return spans


def _collect_cm_ids(e, out: set, seen: set) -> None:
    stack = [e]
    while stack:
        x = stack.pop()
        if id(x) in seen:
            continue
        seen.add(id(x))
        if x.kind == "cm":
            out.add(x.id)
        stack.extend(x.args)


def chunk_pending_inputs(prog, spans):
    """For each span, the cm ids referenced by its exprs that are dests of
    EARLIER program entries (must be fed in as pending values)."""
    dest_at = {}
    for i, (dest, _e) in enumerate(prog):
        if dest[0] == "cm":
            dest_at[dest[1]] = i
    needs = []
    for (e0, e1) in spans:
        refs: set = set()
        seen: set = set()
        for (_d, e) in prog[e0:e1]:
            _collect_cm_ids(e, refs, seen)
        needs.append(sorted(r for r in refs
                            if r in dest_at and dest_at[r] < e0))
    return needs


def step2_exprs_chunk(info: StarkInfo, e0: int, e1: int,
                      sections: Dict[str, GL], const_n: GL,
                      challenges: GL3, publics: GL, x_n: GL):
    """Evaluate step2prev[e0:e1] (f/t expressions); returns exp id ->
    value (h1/h2 sorting runs in the shared-jit kernel)."""
    ctx = EvalContext(info=info, domain="n", sections=sections, const=const_n,
                      challenges=challenges, publics=publics, x=x_n,
                      barrier_every=BARRIER_EVERY)
    exp_vals = eval_program(info.step2prev[e0:e1], ctx)
    return {dest[1]: v for dest, v in exp_vals.items()}


def step2_assemble(info: StarkInfo, h_cols: Dict[int, object]):
    """h1/h2 columns -> cm2_n section matrix."""
    w2 = info.section_widths["cm2_n"]
    return _assemble_section(info.n, w2, h_cols, info, "cm2_n")


def step3_exprs_chunk(info: StarkInfo, e0: int, e1: int,
                      sections: Dict[str, GL], const_n: GL,
                      challenges: GL3, publics: GL, x_n: GL,
                      pending: Dict[int, object]) -> Dict[int, object]:
    """Evaluate step3prev[e0:e1] with earlier chunk results fed as pending
    cm values; returns this chunk's computed cm columns."""
    ctx = EvalContext(info=info, domain="n", sections=sections, const=const_n,
                      challenges=challenges, publics=publics, x=x_n,
                      pending_cm=dict(pending), barrier_every=BARRIER_EVERY)
    out: Dict[int, object] = {}
    memo: Dict = {}
    rows = info.n
    for dest, expr in info.step3prev[e0:e1]:
        v = normalize(eval_expr(expr, ctx, memo), rows)
        ctx.pending_cm[dest[1]] = v
        out[dest[1]] = v
    return out


def step3_assemble(info: StarkInfo, cols: Dict[int, object]) -> GL:
    w3 = info.section_widths["cm3_n"]
    return _assemble_section(info.n, w3, cols, info, "cm3_n")


def step4_span_chunks(info: StarkInfo, max_nodes: int):
    """Constraint spans for step4 bounded by expression node count."""
    return [(s[0], s[1])
            for s in plan_program_chunks(info.step42ns, max_nodes)]


# ---------------------------------------------------------------------------
# Matrixized evaluation map / FRI polynomial
# ---------------------------------------------------------------------------


def _sum_axis(a: GL, axis: int) -> GL:
    """Exact modular sum along `axis` via log-depth halving."""
    if axis == 0:
        return gl.sum_axis0(a)
    lo = jnp.moveaxis(a.lo, axis, 0)
    hi = jnp.moveaxis(a.hi, axis, 0)
    return gl.sum_axis0(GL(lo, hi))


def ev_gather_plan(info: StarkInfo):
    """Static plan: group ev_map entries by (section, dim, prime) with the
    felt positions to gather and the ev indices they land in."""
    groups: Dict = {}
    for k, (kind, pid, prime) in enumerate(info.ev_map):
        if kind == "const":
            sec, pos, dim = "const", pid, 1
        else:
            pm = info.cm_pols[info.qs[pid] if kind == "q" else pid]
            sec = pm.section if pm.section == "cm4_2ns" else \
                pm.section.replace("_n", "_2ns")
            pos, dim = pm.section_pos, pm.dim
        groups.setdefault((sec, dim, bool(prime)), []).append((pos, k))
    return groups


def _take_cols(mat: GL, idxs: np.ndarray) -> GL:
    return GL(jnp.take(mat.lo, idxs, axis=1), jnp.take(mat.hi, idxs, axis=1))


def step5_evals_matrix(info: StarkInfo, sections: Dict[str, GL],
                       const_2ns: GL, xi: GL3, k_chunk: int = 256) -> GL3:
    """evmap as weighted column sums: evals[k] = sum_i p_k(x_i) * lev_i.

    Identical values to step5_evals (modular sums are exact); graph size
    O(#sections * #chunks) instead of O(#ev_entries)."""
    n = info.n
    blow = 1 << info.blowup_bits
    shift_inv = gl.const(pow(SHIFT, P - 2, P))
    w_n = gl.const(gl.w(info.n_bits))
    xis = gl3.mul_base(xi, shift_inv)
    wxis = gl3.mul_base(gl3.mul_base(xi, w_n), shift_inv)
    lev = _intt3(gl3.powers_scan(xis, n))
    lpev = _intt3(gl3.powers_scan(wxis, n))

    size_ev = len(info.ev_map)
    out_lo = [jnp.zeros((size_ev,), jnp.uint32) for _ in range(3)]
    out_hi = [jnp.zeros((size_ev,), jnp.uint32) for _ in range(3)]

    for (sec, dim, prime), entries in ev_gather_plan(info).items():
        mat_full = const_2ns if sec == "const" else sections[sec]
        mat = GL(mat_full.lo[::blow], mat_full.hi[::blow])
        lcoef = lpev if prime else lev
        for c0 in range(0, len(entries), k_chunk):
            part = entries[c0:c0 + k_chunk]
            pos = np.array([p for (p, _k) in part], dtype=np.int32)
            ks = np.array([k for (_p, k) in part], dtype=np.int32)
            if dim == 1:
                cols = _take_cols(mat, pos)       # (n, K)
                for c, lc in enumerate((lcoef.c0, lcoef.c1, lcoef.c2)):
                    s = _sum_axis(gl.mul(cols, GL(lc.lo[:, None],
                                                  lc.hi[:, None])), 0)
                    out_lo[c] = out_lo[c].at[ks].set(s.lo)
                    out_hi[c] = out_hi[c].at[ks].set(s.hi)
            else:
                v = GL3(_take_cols(mat, pos), _take_cols(mat, pos + 1),
                        _take_cols(mat, pos + 2))
                lc3 = GL3(GL(lcoef.c0.lo[:, None], lcoef.c0.hi[:, None]),
                          GL(lcoef.c1.lo[:, None], lcoef.c1.hi[:, None]),
                          GL(lcoef.c2.lo[:, None], lcoef.c2.hi[:, None]))
                prod = gl3.mul(v, lc3)
                for c, comp in enumerate((prod.c0, prod.c1, prod.c2)):
                    s = _sum_axis(comp, 0)
                    out_lo[c] = out_lo[c].at[ks].set(s.lo)
                    out_hi[c] = out_hi[c].at[ks].set(s.hi)
    return GL3(GL(out_lo[0], out_hi[0]), GL(out_lo[1], out_hi[1]),
               GL(out_lo[2], out_hi[2]))


def step5_fri_matrix(info: StarkInfo, sections: Dict[str, GL],
                     const_2ns: GL, challenges: GL3, publics: GL,
                     x_2ns: GL, zi: GL, evals: GL3, xi: GL3,
                     k_chunk: int = 128) -> GL3:
    """FRI polynomial as weighted column sums.

    step52ns terms are (p_k - eval_k) Horner-folded in v1 per (plain,
    primed) subsequence; distributing the fold gives
        F_sub = sum_j v1^(K-1-j) * p_(k_j)  -  sum_j v1^(K-1-j) * eval_(k_j)
    with the first sum a gather + broadcast-mul + log-sum over columns and
    the second a scalar — identical modular values, O(1)-size graph."""
    n_ext = info.n_ext
    v1 = challenges[5]
    v2 = challenges[6]
    w_n = gl.const(gl.w(info.n_bits))
    wxi = gl3.mul_base(xi, w_n)
    xdiv = x_div_x_sub(x_2ns, xi)
    xdivw = x_div_x_sub(x_2ns, wxi)

    plan = ev_gather_plan(info)
    plain = [k for k, (_, _, pr) in enumerate(info.ev_map) if not pr]
    primed = [k for k, (_, _, pr) in enumerate(info.ev_map) if pr]
    orders = {False: {k: j for j, k in enumerate(plain)},
              True: {k: j for j, k in enumerate(primed)}}
    counts = {False: len(plain), True: len(primed)}
    # v1 powers, high power first: coeff[k] = v1^(K-1-order[k])
    max_k = max(counts[False], counts[True], 1)
    pows = gl3.powers_scan(v1, max_k)

    def ev_at(ks: np.ndarray) -> GL3:
        return GL3(evals.c0[ks], evals.c1[ks], evals.c2[ks])

    def coeffs_for(ks, prime) -> GL3:
        idx = np.array([counts[prime] - 1 - orders[prime][int(k)]
                        for k in ks], dtype=np.int32)
        return GL3(pows.c0[idx], pows.c1[idx], pows.c2[idx])

    acc = {False: gl3.zeros((n_ext,)), True: gl3.zeros((n_ext,))}
    sub = {False: gl3.zeros(()), True: gl3.zeros(())}

    for (sec, dim, prime), entries in plan.items():
        mat = const_2ns if sec == "const" else sections[sec]
        for c0 in range(0, len(entries), k_chunk):
            part = entries[c0:c0 + k_chunk]
            pos = np.array([p for (p, _k) in part], dtype=np.int32)
            ks = np.array([k for (_p, k) in part], dtype=np.int32)
            cf = coeffs_for(ks, prime)                   # (K,) GL3
            # subtracted scalar: sum_k coeff_k * eval_k
            sub[prime] = gl3.add(sub[prime],
                                 gl3.sum_axis0(gl3.mul(cf, ev_at(ks))))
            cfb = GL3(GL(cf.c0.lo[None, :], cf.c0.hi[None, :]),
                      GL(cf.c1.lo[None, :], cf.c1.hi[None, :]),
                      GL(cf.c2.lo[None, :], cf.c2.hi[None, :]))
            if dim == 1:
                cols = _take_cols(mat, pos)              # (n_ext, K)
                term = GL3(_sum_axis(gl.mul(cols, cfb.c0), 1),
                           _sum_axis(gl.mul(cols, cfb.c1), 1),
                           _sum_axis(gl.mul(cols, cfb.c2), 1))
            else:
                v = GL3(_take_cols(mat, pos), _take_cols(mat, pos + 1),
                        _take_cols(mat, pos + 2))
                prod = gl3.mul(v, cfb)
                term = GL3(_sum_axis(prod.c0, 1), _sum_axis(prod.c1, 1),
                           _sum_axis(prod.c2, 1))
            acc[prime] = gl3.add(acc[prime], term)

    f_val = gl3.mul(gl3.sub(acc[False], sub[False]), xdiv)
    if primed:
        fw = gl3.mul(gl3.sub(acc[True], sub[True]), gl3.mul(xdivw, v2))
        f_val = gl3.add(f_val, fw)
    return f_val


# ---------------------------------------------------------------------------
# VM-backed stage functions (large circuits: one lax.scan per stage, see
# stark/vm.py — compile cost O(1) in program size)
# ---------------------------------------------------------------------------


def _transpose(m: GL) -> GL:
    return GL(m.lo.T, m.hi.T)


def step2_vm(info: StarkInfo, vmprog, sections: Dict[str, GL], const_n: GL,
             challenges: GL3, publics: GL, x_n: GL):
    """f/t expressions via the VM; returns exp id -> (n,) GL3."""
    from . import vm as vm_mod

    sections_t = {"cm1_n": _transpose(sections["cm1_n"]),
                  "const": _transpose(const_n)}
    out = vm_mod.run_program(
        vmprog, info, sections_t, info.n, challenges=challenges,
        publics=publics, x=x_n, roll_k=1)
    return {dest[1]: v for dest, v in out.items()}


def step3_vm(info: StarkInfo, vmprog, sections: Dict[str, GL], const_n: GL,
             challenges: GL3, publics: GL, x_n: GL):
    """num/den/im columns via the VM; returns cm id -> (n,) GL3."""
    from . import vm as vm_mod

    sections_t = {"cm1_n": _transpose(sections["cm1_n"]),
                  "cm2_n": _transpose(sections["cm2_n"]),
                  "const": _transpose(const_n)}
    out = vm_mod.run_program(
        vmprog, info, sections_t, info.n, challenges=challenges,
        publics=publics, x=x_n, roll_k=1)
    return {dest[1]: v for dest, v in out.items()}


def step4_vm(info: StarkInfo, vmprog, sections: Dict[str, GL],
             const_2ns: GL, challenges: GL3, publics: GL, x_2ns: GL,
             zi: GL) -> GL:
    """Full quotient via the VM (c_exp as ONE dest — the alpha-Horner
    accumulator folds inside the scan, so constraint values die
    immediately instead of pinning 979 registers), then the INTT/split/
    NTT finalize."""
    from . import vm as vm_mod

    sections_t = {
        "cm1_2ns": _transpose(sections["cm1_2ns"]),
        "cm2_2ns": _transpose(sections["cm2_2ns"]),
        "cm3_2ns": _transpose(sections["cm3_2ns"]),
        "const": _transpose(const_2ns),
    }
    out = vm_mod.run_program(
        vmprog, info, sections_t, info.n_ext, challenges=challenges,
        publics=publics, x=x_2ns, zi=zi,
        roll_k=1 << info.blowup_bits)
    return step4_finalize(info, out[("acc", 0)], zi)

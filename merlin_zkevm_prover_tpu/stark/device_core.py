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
from .evaluator import EvalContext, eval_expr, eval_program
from .plookup import calculate_h1h2, calculate_z


def _assemble_section(rows: int, width: int, cols: Dict[int, object],
                      info: StarkInfo, section: str) -> GL:
    lo = jnp.zeros((rows, width), jnp.uint32)
    hi = jnp.zeros((rows, width), jnp.uint32)
    for pid, val in cols.items():
        pm = info.cm_pols[pid]
        assert pm.section == section
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
                      x=x_2ns, zi=zi)
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

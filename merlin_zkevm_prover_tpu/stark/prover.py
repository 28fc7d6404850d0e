"""The 5-step STARK prover (reference Starks::genProof, starks.cpp:9-403).

Pipeline per proof, with the exact reference transcript order:

  step1: LDE(cm1) -> tree0 -> root0
  step2: challenges u, defVal -> f/t expressions -> plookup h1/h2 ->
         LDE(cm2) -> tree1 -> root1
  step3: challenges gamma, beta -> num/den im pols -> grand products z ->
         LDE(cm3) -> tree2 -> root2
  step4: challenge alpha -> quotient on ext domain -> INTT/split/NTT ->
         cm4 -> tree3 -> root3
  step5: challenge xi -> LEv/LpEv -> evmap -> evals -> challenges v1, v2 ->
         xDivXSubXi -> FRI polynomial
  FRI:   fold/commit per step, queries

All bulk math runs on device (JAX); the transcript and query extraction are
host-side (bytes per interaction, reference design note SURVEY §5).
"""

from __future__ import annotations

import functools
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
from ..utils.timer import TimerLog
from .compiler import StarkInfo
from .evaluator import EvalContext, eval_program
from .fri import fri_prove
from .merkle_tree import MerkleTreeGL
from .plookup import calculate_h1h2, calculate_z
from .proof import StarkProof, TreeOpening
from .transcript import Transcript

HASH_SIZE = 4


def _empty_section(rows: int) -> GL:
    return gl.zeros((rows, 0))


def _assemble_section(rows: int, width: int, cols: Dict[int, "GL|GL3"],
                      info: StarkInfo, section: str) -> GL:
    """Place computed cm columns at their section positions."""
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


def _challenges_gl3(ch: List[Optional[List[int]]]) -> GL3:
    vals = np.zeros((8, 3), dtype=np.uint64)
    for i, c in enumerate(ch):
        if c is not None:
            vals[i] = c
    return gl3.from_u64(vals)


class StarkProver:
    """Holds the preprocessed data for one circuit (const pols + trees)."""

    def __init__(self, info: StarkInfo, const_values: np.ndarray):
        self.info = info
        n, n_ext = info.n, info.n_ext
        assert const_values.shape == (n, info.n_constants)
        self.const_n = gl.from_u64(const_values.astype(np.uint64))
        if info.n_constants > 0:
            self.const_2ns = nttmod.extend_pol(
                self.const_n, info.n_bits, info.n_bits_ext
            )
        else:
            self.const_2ns = gl.zeros((n_ext, 0))
        self.const_tree = MerkleTreeGL(self.const_2ns)
        self.const_tree.merkelize()

        # domain tables
        self.x_n = gl.from_u64(gl.powers_np(gl.w(info.n_bits), n))
        self.x_2ns = gl.from_u64(
            gl.powers_np(gl.w(info.n_bits_ext), n_ext, start=SHIFT)
        )
        # ZhInv: periodic over blowup (reference zhInv.cpp)
        blow = 1 << info.blowup_bits
        sn = pow(SHIFT, n, P)
        zi_period = np.array(
            [
                pow((sn * pow(gl.w(info.blowup_bits), i, P) - 1) % P, P - 2, P)
                for i in range(blow)
            ],
            dtype=np.uint64,
        )
        self.zi = gl.from_u64(np.tile(zi_period, n))

    # ------------------------------------------------------------------
    def prove(self, cm1_trace: np.ndarray, publics: Optional[np.ndarray] = None,
              timer: Optional[TimerLog] = None) -> StarkProof:
        info = self.info
        n, n_ext = info.n, info.n_ext
        blowup = 1 << info.blowup_bits
        tlog = timer or TimerLog(f"stark:{info.name}")
        if publics is None:
            publics = np.array(
                [cm1_trace[row, cid] for (_, cid, row) in info.publics],
                dtype=np.uint64,
            )
        publics = np.asarray(publics, dtype=np.uint64)
        assert publics.shape == (info.n_publics,)

        transcript = Transcript()
        transcript.put([int(x) for x in publics])
        challenges: List[Optional[List[int]]] = [None] * 8

        sections: Dict[str, GL] = {}
        trees: Dict[str, MerkleTreeGL] = {}

        # ---- step 1 ----
        with tlog.span("STARK_STEP_1"):
            assert cm1_trace.shape == (n, info.n_cm[0])
            sections["cm1_n"] = gl.from_u64(cm1_trace.astype(np.uint64))
            sections["cm1_2ns"] = nttmod.extend_pol(
                sections["cm1_n"], info.n_bits, info.n_bits_ext
            )
            trees["cm1"] = MerkleTreeGL(sections["cm1_2ns"])
            trees["cm1"].merkelize()
            transcript.put(trees["cm1"].root())

        # ---- step 2: plookup h1/h2 ----
        with tlog.span("STARK_STEP_2"):
            challenges[0] = transcript.get_field()
            challenges[1] = transcript.get_field()
            ch_dev = _challenges_gl3(challenges)
            ctx_n = EvalContext(
                info=info, domain="n", sections=sections, const=self.const_n,
                challenges=ch_dev, publics=gl.from_u64(publics), x=self.x_n,
            )
            exp_vals = eval_program(info.step2prev, ctx_n)
            cm2_cols: Dict[int, object] = {}
            for pu in info.pu_ctx:
                f_val = exp_vals[("exp", pu.f_exp_id)]
                t_val = exp_vals[("exp", pu.t_exp_id)]
                h1, h2, ok = calculate_h1h2(f_val, t_val)
                if not bool(ok):
                    raise ValueError(
                        f"plookup {pu.f_exp_id}: f value not included in t"
                    )
                cm2_cols[pu.h1_id] = h1
                cm2_cols[pu.h2_id] = h2
            w2 = info.section_widths["cm2_n"]
            sections["cm2_n"] = _assemble_section(n, w2, cm2_cols, info, "cm2_n")
            if w2 > 0:
                sections["cm2_2ns"] = nttmod.extend_pol(
                    sections["cm2_n"], info.n_bits, info.n_bits_ext
                )
            else:
                sections["cm2_2ns"] = gl.zeros((n_ext, 0))
            trees["cm2"] = MerkleTreeGL(sections["cm2_2ns"])
            trees["cm2"].merkelize()
            transcript.put(trees["cm2"].root())

        # ---- step 3: grand products ----
        with tlog.span("STARK_STEP_3"):
            challenges[2] = transcript.get_field()
            challenges[3] = transcript.get_field()
            ch_dev = _challenges_gl3(challenges)
            ctx_n = EvalContext(
                info=info, domain="n", sections=sections, const=self.const_n,
                challenges=ch_dev, publics=gl.from_u64(publics), x=self.x_n,
            )
            numden = eval_program(info.step3prev, ctx_n)
            cm3_cols: Dict[int, object] = {}
            for ctxs in (info.pu_ctx, info.pe_ctx, info.ci_ctx):
                for c in ctxs:
                    num = numden[("cm", c.num_id)]
                    den = numden[("cm", c.den_id)]
                    if not isinstance(num, GL3):
                        num = gl3.from_base(num)
                    if not isinstance(den, GL3):
                        den = gl3.from_base(den)
                    cm3_cols[c.num_id] = num
                    cm3_cols[c.den_id] = den
                    cm3_cols[c.z_id] = calculate_z(num, den)
            w3 = info.section_widths["cm3_n"]
            sections["cm3_n"] = _assemble_section(n, w3, cm3_cols, info, "cm3_n")
            if w3 > 0:
                sections["cm3_2ns"] = nttmod.extend_pol(
                    sections["cm3_n"], info.n_bits, info.n_bits_ext
                )
            else:
                sections["cm3_2ns"] = gl.zeros((n_ext, 0))
            trees["cm3"] = MerkleTreeGL(sections["cm3_2ns"])
            trees["cm3"].merkelize()
            transcript.put(trees["cm3"].root())

        # ---- step 4: quotient ----
        with tlog.span("STARK_STEP_4"):
            challenges[4] = transcript.get_field()
            ch_dev = _challenges_gl3(challenges)
            ctx_ext = EvalContext(
                info=info, domain="ext", sections=sections, const=self.const_2ns,
                challenges=ch_dev, publics=gl.from_u64(publics), x=self.x_2ns,
                zi=self.zi,
            )
            q_val = eval_program(info.step42ns, ctx_ext)[("q",)]
            if not isinstance(q_val, GL3):
                q_val = gl3.from_base(q_val)
            # split q into q_deg chunks of degree < N (starks.cpp:260-285)
            q_mat = GL(
                jnp.stack([q_val.c0.lo, q_val.c1.lo, q_val.c2.lo], axis=1),
                jnp.stack([q_val.c0.hi, q_val.c1.hi, q_val.c2.hi], axis=1),
            )
            d = nttmod.intt(q_mat)                        # (n_ext, 3) coeffs
            shift_in = pow(pow(SHIFT, P - 2, P), n, P)
            cols_lo, cols_hi = [], []
            for p_i in range(info.q_deg):
                chunk = GL(d.lo[p_i * n : (p_i + 1) * n],
                           d.hi[p_i * n : (p_i + 1) * n])
                chunk = gl.mul(chunk, gl.const(pow(shift_in, p_i, P)))
                pad = ((0, n_ext - n), (0, 0))
                cols_lo.append(jnp.pad(chunk.lo, pad))
                cols_hi.append(jnp.pad(chunk.hi, pad))
            q_coeffs = GL(jnp.concatenate(cols_lo, axis=1),
                          jnp.concatenate(cols_hi, axis=1))
            sections["cm4_2ns"] = nttmod.ntt(q_coeffs)
            trees["cm4"] = MerkleTreeGL(sections["cm4_2ns"])
            trees["cm4"].merkelize()
            transcript.put(trees["cm4"].root())

        # ---- step 5: evals + FRI polynomial ----
        with tlog.span("STARK_STEP_5"):
            challenges[7] = transcript.get_field()
            xi = challenges[7]
            shift_inv = pow(SHIFT, P - 2, P)
            w_n = gl.w(info.n_bits)
            xis = [(x * shift_inv) % P for x in xi]
            wxis = [(x * w_n % P) * shift_inv % P for x in xi]
            lev = gl3.powers_scan(gl3.const(*xis), n)
            lpev = gl3.powers_scan(gl3.const(*wxis), n)
            lev_c = self._intt3(lev)
            lpev_c = self._intt3(lpev)

            evals: List[GL3] = []
            for (kind, pid, prime) in info.ev_map:
                vals = self._ev_pol_values(kind, pid, sections)
                lcoef = lpev_c if prime else lev_c
                if isinstance(vals, GL3):
                    prod = gl3.mul(vals, lcoef)
                else:
                    prod = gl3.mul_base(lcoef, vals)
                evals.append(gl3.sum_axis0(prod))
            evals_np = np.stack([gl3.to_u64(e) for e in evals])
            for e in evals_np:
                transcript.put([int(v) for v in e])

            challenges[5] = transcript.get_field()
            challenges[6] = transcript.get_field()
            ch_dev = _challenges_gl3(challenges)

            # xDivXSubXi / xDivXSubWXi over the ext domain
            wxi = [(x * w_n) % P for x in xi]
            xdiv = self._x_div_x_sub(gl3.const(*xi))
            xdivw = self._x_div_x_sub(gl3.const(*wxi))

            ctx_ext = EvalContext(
                info=info, domain="ext", sections=sections, const=self.const_2ns,
                challenges=ch_dev, publics=gl.from_u64(publics), x=self.x_2ns,
                zi=self.zi, evals=gl3.from_u64(evals_np),
                x_div_x_sub_xi=xdiv, x_div_x_sub_wxi=xdivw,
            )
            f_val = eval_program(info.step52ns, ctx_ext)[("f",)]

        # ---- FRI ----
        with tlog.span("STARK_FRI"):
            fri_trees, final_pol, _ = fri_prove(
                transcript, f_val, info.fri_step_bits
            )
            ys = transcript.get_permutations(info.n_queries, info.fri_step_bits[0])

            queries_step0 = []
            tree_names = ["cm1", "cm2", "cm3", "cm4"]
            for y in ys:
                openings = {}
                for tn in tree_names:
                    row, sib = trees[tn].get_group_proof(y)
                    openings[tn] = TreeOpening([int(v) for v in row], sib)
                row, sib = self.const_tree.get_group_proof(y)
                openings["const"] = TreeOpening([int(v) for v in row], sib)
                queries_step0.append(openings)

            queries_fri = []
            cur_ys = list(ys)
            for si in range(1, len(info.fri_step_bits)):
                bits = info.fri_step_bits[si]
                cur_ys = [y % (1 << bits) for y in cur_ys]
                step_q = []
                for y in cur_ys:
                    row, sib = fri_trees[si].get_group_proof(y)
                    step_q.append(TreeOpening([int(v) for v in row], sib))
                queries_fri.append(step_q)

        return StarkProof(
            name=info.name,
            roots=[trees[t].root() for t in ("cm1", "cm2", "cm3", "cm4")],
            evals=[[int(v) for v in e] for e in evals_np],
            fri_roots=[t.root() for t in fri_trees[1:]],
            final_pol=[[int(v) for v in e] for e in final_pol],
            queries_step0=queries_step0,
            queries_fri=queries_fri,
            publics=[int(x) for x in publics],
        )

    # ------------------------------------------------------------------
    def _intt3(self, v: GL3) -> GL3:
        mat = GL(
            jnp.stack([v.c0.lo, v.c1.lo, v.c2.lo], axis=1),
            jnp.stack([v.c0.hi, v.c1.hi, v.c2.hi], axis=1),
        )
        c = nttmod.intt(mat)
        return GL3(
            GL(c.lo[:, 0], c.hi[:, 0]),
            GL(c.lo[:, 1], c.hi[:, 1]),
            GL(c.lo[:, 2], c.hi[:, 2]),
        )

    def _ev_pol_values(self, kind: str, pid: int, sections: Dict[str, GL]):
        """Values of an evMap polynomial on the stride-blowup coset rows."""
        info = self.info
        blow = 1 << info.blowup_bits
        if kind == "const":
            mat = self.const_2ns
            return GL(mat.lo[::blow, pid], mat.hi[::blow, pid])
        if kind == "q":
            pm = info.cm_pols[info.qs[pid]]
        else:
            pm = info.cm_pols[pid]
        section = pm.section if pm.section == "cm4_2ns" else pm.section.replace("_n", "_2ns")
        mat = sections[section]
        pos = pm.section_pos
        if pm.dim == 1:
            return GL(mat.lo[::blow, pos], mat.hi[::blow, pos])
        return GL3(
            GL(mat.lo[::blow, pos], mat.hi[::blow, pos]),
            GL(mat.lo[::blow, pos + 1], mat.hi[::blow, pos + 1]),
            GL(mat.lo[::blow, pos + 2], mat.hi[::blow, pos + 2]),
        )

    def _x_div_x_sub(self, point: GL3) -> GL3:
        """x / (x - point) over the full extended domain."""
        x = self.x_2ns
        nc1 = gl.neg(point.c1)
        nc2 = gl.neg(point.c2)
        diff = GL3(
            gl.sub(x, point.c0),
            GL(jnp.broadcast_to(nc1.lo, x.shape), jnp.broadcast_to(nc1.hi, x.shape)),
            GL(jnp.broadcast_to(nc2.lo, x.shape), jnp.broadcast_to(nc2.hi, x.shape)),
        )
        inv = gl3.batch_inverse_parallel(diff)
        return gl3.mul_base(inv, x)

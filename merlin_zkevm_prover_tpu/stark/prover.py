"""The 5-step STARK prover (reference Starks::genProof, starks.cpp:9-403).

Pipeline per proof, with the exact reference transcript order:

  step1: LDE(cm1) -> tree0 -> root0
  step2: challenges u, defVal -> f/t expressions -> plookup h1/h2 ->
         LDE(cm2) -> tree1 -> root1
  step3: challenges gamma, beta -> num/den im pols -> grand products z ->
         LDE(cm3) -> tree2 -> root2
  step4: challenge alpha -> quotient on ext domain -> INTT/split/NTT ->
         cm4 -> tree3 -> root3
  step5: challenge xi -> evmap -> evals -> challenges v1, v2 ->
         xDivXSubXi -> FRI polynomial
  FRI:   fold/commit per step, queries

All bulk math is in jit-compiled device stage functions (device_core.py);
only roots, challenges and query rows cross the host boundary (bytes per
interaction, the reference's own host/device split — SURVEY §5).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional

import jax
import numpy as np

from ..ops import goldilocks as gl
from ..ops import goldilocks3 as gl3
from ..ops import ntt as nttmod
from ..ops import poseidon_gl
from ..ops.goldilocks import GL, P, SHIFT
from ..ops.goldilocks3 import GL3
from ..utils.timer import TimerLog
from . import device_core as core
from . import plookup as plookup_mod
from .compiler import StarkInfo
from .fri import fri_prove
from .merkle_tree import MerkleTreeGL
from .proof import StarkProof, TreeOpening
from .transcript import Transcript

HASH_SIZE = 4


def _challenges_gl3(ch: List[Optional[List[int]]]) -> GL3:
    vals = np.zeros((8, 3), dtype=np.uint64)
    for i, c in enumerate(ch):
        if c is not None:
            vals[i] = c
    return gl3.from_u64(vals)


class StarkProver:
    """Preprocessed proving context for one circuit: const pols, const tree,
    domain tables, and jitted device stages.

    `tree_cls` / `transcript_cls` parameterize the hash/commitment scheme:
    the default is the Poseidon-GL binary tree + GL sponge transcript
    (reference Starks); stark/prover_bn128.StarkProverBN128 swaps in the
    arity-16 Poseidon-BN254 tree + Fr transcript (reference
    StarkRecursiveF, starkRecursiveF.cpp:194-383).
    """

    tree_cls = MerkleTreeGL
    transcript_cls = Transcript

    def __init__(self, info: StarkInfo, const_values: np.ndarray):
        self.info = info
        n, n_ext = info.n, info.n_ext
        assert const_values.shape == (n, info.n_constants)
        self.const_n = gl.from_u64(const_values.astype(np.uint64))
        if info.n_constants > 0:
            # blocked LDE bounds peak HBM (memory plan for the 220-column
            # zkEVM const matrix; reference buffer plan prover.cpp:99-120)
            self.const_2ns = nttmod.extend_pol_blocked(
                self.const_n, info.n_bits, info.n_bits_ext
            )
        else:
            self.const_2ns = gl.zeros((n_ext, 0))
        self.const_tree = self.tree_cls(self.const_2ns)
        self.const_tree.merkelize()

        self.x_n = gl.from_u64(gl.powers_np(gl.w(info.n_bits), n))
        self.x_2ns = gl.from_u64(
            gl.powers_np(gl.w(info.n_bits_ext), n_ext, start=SHIFT)
        )
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

        # jitted device stages (traced once per section signature); LDEs
        # run column-blocked outside the stage jits so one 64-column
        # block's intermediates bound peak HBM on wide sections
        self._extend = functools.partial(
            nttmod.extend_pol_blocked, n_bits=info.n_bits,
            n_bits_ext=info.n_bits_ext)

        # Staged stage functions with bounded-size graphs (see the staged
        # section of device_core.py: XLA:TPU compile cost is super-linear
        # in fusion/graph size, so the production path hands the compiler
        # node-count-bounded chunks and reuses ONE jitted sort/scan kernel
        # across all plookup/grand-product arguments).
        max_nodes = int(os.environ.get("MERLIN_STEP_MAX_NODES", "250"))
        # Above this program size, stages run on the scan VM (stark/vm.py:
        # one O(1)-compile lax.scan per stage — the chelpers-parser form);
        # below it, fused per-chunk graphs win on runtime and compile fast
        # enough (smoke/recursion circuits).
        vm_min = int(os.environ.get("MERLIN_VM_MIN_NODES", "3000"))
        from . import vm as vm_mod

        self._h1h2 = jax.jit(plookup_mod.calculate_h1h2)
        self._calc_z = jax.jit(plookup_mod.calculate_z)
        self._step2_asm = jax.jit(functools.partial(core.step2_assemble,
                                                    info))
        self._step3_asm = jax.jit(functools.partial(core.step3_assemble,
                                                    info))
        self._step4_fin = jax.jit(functools.partial(core.step4_finalize,
                                                    info))

        def prog_nodes(prog):
            seen: set = set()
            return sum(core._expr_new_nodes(e, seen) for _d, e in prog)

        self._vm2 = self._vm3 = self._vm4 = None
        if prog_nodes(info.step2prev) > vm_min:
            p2 = vm_mod.compile_program(info.step2prev, info, "n",
                                        ["cm1_n", "const"])
            self._vm2 = jax.jit(functools.partial(core.step2_vm, info, p2))
        else:
            self._step2_spans = core.plan_program_chunks(info.step2prev,
                                                         max_nodes)
            self._step2_chunks = [
                jax.jit(functools.partial(core.step2_exprs_chunk, info,
                                          e0, e1))
                for (e0, e1) in self._step2_spans
            ]
        if prog_nodes(info.step3prev) > vm_min:
            p3 = vm_mod.compile_program_ordered(
                info.step3prev, info, "n", ["cm1_n", "cm2_n", "const"])
            self._vm3 = jax.jit(functools.partial(core.step3_vm, info, p3))
        else:
            self._step3_spans = core.plan_program_chunks(info.step3prev,
                                                         max_nodes)
            self._step3_needs = core.chunk_pending_inputs(
                info.step3prev, self._step3_spans)
            self._step3_chunks = [
                jax.jit(functools.partial(core.step3_exprs_chunk, info,
                                          e0, e1))
                for (e0, e1) in self._step3_spans
            ]
        if prog_nodes(info.step42ns) > vm_min:
            p4 = vm_mod.compile_program(
                [(("acc", 0), info.c_exp)], info, "ext",
                ["cm1_2ns", "cm2_2ns", "cm3_2ns", "const"])
            self._vm4 = jax.jit(functools.partial(core.step4_vm, info, p4))
        else:
            # node-count-bounded constraint batches (memory AND compile
            # plan: the zkEVM's 979 constraints at 2^19 can neither stack
            # in HBM nor compile as one graph)
            self._step4_spans = core.step4_span_chunks(info, max_nodes)
            self._step4_chunks = [
                jax.jit(functools.partial(core.step4_chunk, info, k0, k1))
                for (k0, k1) in self._step4_spans
            ]
        step5_matrix_min = int(os.environ.get("MERLIN_STEP5_MATRIX_MIN",
                                              "128"))
        if len(info.ev_map) > step5_matrix_min:
            self._step5_evals = jax.jit(
                functools.partial(core.step5_evals_matrix, info))
            self._step5_fri = jax.jit(
                functools.partial(core.step5_fri_matrix, info))
            self._step5_matrix = True
        else:
            self._step5_evals = jax.jit(
                functools.partial(core.step5_evals, info))
            self._step5_fri = jax.jit(
                functools.partial(core.step5_fri_pol, info))
            self._step5_matrix = False

    # ------------------------------------------------------------------
    def prove(self, cm1_trace: np.ndarray, publics: Optional[np.ndarray] = None,
              timer: Optional[TimerLog] = None) -> StarkProof:
        info = self.info
        n = info.n
        tlog = timer or TimerLog(f"stark:{info.name}", quiet=True)
        if publics is None:
            publics = np.array(
                [cm1_trace[row, cid] for (_, cid, row) in info.publics],
                dtype=np.uint64,
            )
        publics = np.asarray(publics, dtype=np.uint64)
        assert publics.shape == (info.n_publics,)
        publics_dev = gl.from_u64(publics)

        transcript = self.transcript_cls()
        transcript.put([int(x) for x in publics])
        challenges: List[Optional[List[int]]] = [None] * 8

        sections: Dict[str, GL] = {}
        trees: Dict[str, MerkleTreeGL] = {}

        def commit(name: str, section_n: GL):
            lde = self._extend(section_n)
            sections[f"{name}_2ns"] = lde
            tree = self.tree_cls(lde)
            tree.merkelize()
            trees[name.replace("_n", "")] = tree
            return tree

        # ---- step 1 ----
        with tlog.span("STARK_STEP_1"):
            assert cm1_trace.shape == (n, info.n_cm[0])
            sections["cm1_n"] = gl.from_u64(cm1_trace.astype(np.uint64))
            tree = commit("cm1", sections["cm1_n"])
            transcript.put(tree.root())

        # ---- step 2 ----
        with tlog.span("STARK_STEP_2"):
            challenges[0] = transcript.get_field()
            challenges[1] = transcript.get_field()
            ch_dev = _challenges_gl3(challenges)
            exp_vals: Dict[int, object] = {}
            if self._vm2 is not None:
                out = self._vm2({"cm1_n": sections["cm1_n"]}, self.const_n,
                                ch_dev, publics_dev, self.x_n)
                for eid, v in out.items():
                    # dim-1 expressions ride the VM as GL3 with zero high
                    # components; drop to GL so the h1/h2 sort keys stay
                    # single-limb
                    exp_vals[eid] = v.c0 if info.exp_dims[eid] == 1 else v
                del out
            else:
                for fn in self._step2_chunks:
                    exp_vals.update(fn(
                        {"cm1_n": sections["cm1_n"]}, self.const_n, ch_dev,
                        publics_dev, self.x_n,
                    ))
            h_cols: Dict[int, object] = {}
            oks = []
            for pu in info.pu_ctx:
                f = exp_vals[pu.f_exp_id]
                t = exp_vals[pu.t_exp_id]
                h1, h2, ok = self._h1h2(f, t)
                h_cols[pu.h1_id] = h1
                h_cols[pu.h2_id] = h2
                oks.append(ok)
            if oks and not all(bool(x) for x in jax.device_get(oks)):
                raise ValueError("plookup: f value not included in t")
            cm2_n = self._step2_asm(h_cols)
            del exp_vals, h_cols    # free f/t + h columns' HBM now
            sections["cm2_n"] = cm2_n
            tree = commit("cm2", cm2_n)
            del cm2_n
            if info.pu_ctx:
                del f, t, h1, h2
            transcript.put(tree.root())

        # ---- step 3 ----
        with tlog.span("STARK_STEP_3"):
            challenges[2] = transcript.get_field()
            challenges[3] = transcript.get_field()
            ch_dev = _challenges_gl3(challenges)
            sec3_in = {"cm1_n": sections["cm1_n"],
                       "cm2_n": sections["cm2_n"]}
            pending: Dict[int, object] = {}
            if self._vm3 is not None:
                out = self._vm3(sec3_in, self.const_n, ch_dev,
                                publics_dev, self.x_n)
                for pid, v in out.items():
                    pending[pid] = v.c0 if info.cm_pols[pid].dim == 1 \
                        else v
                del out
            else:
                for fn, need in zip(self._step3_chunks, self._step3_needs):
                    out = fn(sec3_in, self.const_n, ch_dev, publics_dev,
                             self.x_n, {i: pending[i] for i in need})
                    pending.update(out)

            def _as3(v):
                return v if isinstance(v, GL3) else gl3.from_base(v)

            cm3_cols = dict(pending)
            for ctxs in (info.pu_ctx, info.pe_ctx, info.ci_ctx):
                for c in ctxs:
                    num = _as3(pending[c.num_id])
                    den = _as3(pending[c.den_id])
                    cm3_cols[c.num_id] = num
                    cm3_cols[c.den_id] = den
                    cm3_cols[c.z_id] = self._calc_z(num, den)
            cm3_n = self._step3_asm(cm3_cols)
            # free the ~3 GB of num/den/im/z column intermediates before
            # the ext-domain stages (the 2^18 x 665-col memory plan needs
            # every section's HBM exactly once)
            pending.clear()
            cm3_cols.clear()
            del pending, cm3_cols, sec3_in
            if info.pu_ctx or info.pe_ctx or info.ci_ctx:
                del num, den
            sections["cm3_n"] = cm3_n
            tree = commit("cm3", cm3_n)
            del cm3_n
            transcript.put(tree.root())

        # ---- step 4 ----
        # n-domain sections are dead from here (steps 4/5 read only the
        # extended domain); drop them so their HBM is reusable
        for k in ("cm1_n", "cm2_n", "cm3_n"):
            sections.pop(k, None)
        with tlog.span("STARK_STEP_4"):
            challenges[4] = transcript.get_field()
            ch_dev = _challenges_gl3(challenges)
            ext_sections = {
                k: sections[k]
                for k in ("cm1_2ns", "cm2_2ns", "cm3_2ns")
            }
            if self._vm4 is not None:
                cm4 = self._vm4(ext_sections, self.const_2ns, ch_dev,
                                publics_dev, self.x_2ns, self.zi)
            else:
                acc = gl3.zeros((info.n_ext,))
                for fn in self._step4_chunks:
                    acc = fn(ext_sections, self.const_2ns, ch_dev,
                             publics_dev, self.x_2ns, self.zi, acc)
                cm4 = self._step4_fin(acc, self.zi)
            sections["cm4_2ns"] = cm4
            tree = self.tree_cls(cm4)
            tree.merkelize()
            trees["cm4"] = tree
            transcript.put(tree.root())

        # ---- step 5 ----
        with tlog.span("STARK_STEP_5"):
            challenges[7] = transcript.get_field()
            xi_dev = gl3.const(*challenges[7])
            ext_sections["cm4_2ns"] = sections["cm4_2ns"]
            evals = self._step5_evals(ext_sections, self.const_2ns, xi_dev)
            evals_np = gl3.to_u64(evals)
            for e in evals_np:
                transcript.put([int(v) for v in e])
            challenges[5] = transcript.get_field()
            challenges[6] = transcript.get_field()
            ch_dev = _challenges_gl3(challenges)
            f_val = self._step5_fri(
                ext_sections, self.const_2ns, ch_dev, publics_dev,
                self.x_2ns, self.zi, evals, xi_dev,
            )

        # ---- FRI ----
        with tlog.span("STARK_FRI"):
            fri_trees, final_pol, _ = fri_prove(
                transcript, f_val, info.fri_step_bits,
                tree_cls=self.tree_cls,
            )
            ys = transcript.get_permutations(
                info.n_queries, info.fri_step_bits[0]
            )
            queries_step0 = []
            for y in ys:
                openings = {}
                for tn in ("cm1", "cm2", "cm3", "cm4"):
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

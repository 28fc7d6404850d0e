"""R1CS -> 3-wire PLONK constraint-system conversion for the fflonk
final stage (reference: the final circuit ships as a circom-generated
fflonk zkey, prover.cpp:887; here the native R1CS is PLONKized instead).

Each R1CS constraint (sum a_i w_i)(sum b_i w_i) = (sum c_i w_i) becomes:

  * addition-chain gates reducing each linear combination to one wire
    (gate: qL x + qR y + qO z = 0 with qL/qR the coefficients), and
  * one multiplication gate  la * lb - lc = 0.

Wire values are PLONK cells; equal R1CS signals across cells are linked
through the sigma copy-constraint permutation (cells holding the same
signal form one cycle).  Publics occupy the first rows' a-cells
(snarkjs convention: row j exposes public j via qL=1 + PI).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .fflonk import FR, PlonkCS


class _PlonkBuilder:
    def __init__(self):
        self.qL: List[int] = []
        self.qR: List[int] = []
        self.qM: List[int] = []
        self.qO: List[int] = []
        self.qC: List[int] = []
        self.a_sig: List[int] = []   # R1CS signal id per cell (-1 = unused)
        self.b_sig: List[int] = []
        self.c_sig: List[int] = []
        self.a_val: List[int] = []
        self.b_val: List[int] = []
        self.c_val: List[int] = []

    def gate(self, ql, qr, qm, qo, qc, sa, sb, sc, va, vb, vc):
        self.qL.append(ql % FR)
        self.qR.append(qr % FR)
        self.qM.append(qm % FR)
        self.qO.append(qo % FR)
        self.qC.append(qc % FR)
        self.a_sig.append(sa)
        self.b_sig.append(sb)
        self.c_sig.append(sc)
        self.a_val.append(va % FR)
        self.b_val.append(vb % FR)
        self.c_val.append(vc % FR)

    @property
    def n_gates(self):
        return len(self.qL)


def _lc_terms(lc: Dict[int, int]) -> Tuple[int, List[Tuple[int, int]]]:
    """Split a linear combination into (constant, [(signal, coef), ...])."""
    const = 0
    terms = []
    for s, k in sorted(lc.items()):
        k %= FR
        if k == 0:
            continue
        if s == 0:
            const = k
        else:
            terms.append((s, k))
    return const, terms


def r1cs_to_plonk(r1cs, witness: List[int]
                  ) -> Tuple[PlonkCS, List[int], List[int], List[int]]:
    """Returns (cs, a_vals, b_vals, c_vals) with the witness placed.

    `witness` is the full R1CS assignment [1, publics..., privates...];
    fresh signals are allocated for linear-chain intermediates.
    """
    wit = [int(v) % FR for v in witness]
    next_sig = [len(wit)]
    pb = _PlonkBuilder()

    def fresh(v: int) -> int:
        wit.append(v % FR)
        next_sig[0] += 1
        return next_sig[0] - 1

    def reduce_lc(lc: Dict[int, int]) -> Tuple[int, int]:
        """Reduce a linear combination to a single (signal, value) via
        addition gates; returns (-1, const) for pure constants."""
        const, terms = _lc_terms(lc)
        if not terms:
            return -1, const
        cur_sig, cur_coef = terms[0]
        cur_val = wit[cur_sig]
        if len(terms) == 1 and const == 0 and cur_coef == 1:
            return cur_sig, cur_val
        rest = terms[1:]
        if not rest:  # single scaled/offset term: z = k*x + c
            out_val = (cur_coef * cur_val + const) % FR
            out_sig = fresh(out_val)
            pb.gate(cur_coef, 0, 0, (-1) % FR, const,
                    cur_sig, -1, out_sig, cur_val, 0, out_val)
            return out_sig, out_val
        for idx, (s2, k2) in enumerate(rest):
            c_here = const if idx == len(rest) - 1 else 0
            out_val = (cur_coef * cur_val + k2 * wit[s2] + c_here) % FR
            out_sig = fresh(out_val)
            # gate: cur_coef*x + k2*y - z + c = 0
            pb.gate(cur_coef, k2, 0, (-1) % FR, c_here,
                    cur_sig, s2, out_sig, cur_val, wit[s2], out_val)
            cur_sig, cur_val, cur_coef = out_sig, out_val, 1
        return cur_sig, cur_val

    # public rows first (row j: qL=1, a-cell = public j, balanced by PI)
    n_public = r1cs.n_public
    for j in range(n_public):
        pb.gate(1, 0, 0, 0, 0, j + 1, -1, -1, wit[j + 1], 0, 0)

    for ci in range(len(r1cs.a)):
        sa, va = reduce_lc(r1cs.a[ci])
        sb, vb = reduce_lc(r1cs.b[ci])
        sc, vc = reduce_lc(r1cs.c[ci])
        # (va)(vb) = vc; constant sides fold into selectors — a constant
        # must never occupy a free (copy-unconstrained) cell, or the gate
        # becomes satisfiable for any witness
        qo = (-1) % FR if sc >= 0 else 0
        qc = 0 if sc >= 0 else (-vc) % FR
        vcell = vc if sc >= 0 else 0
        if sa == -1 and sb == -1:
            if sc == -1:
                assert va * vb % FR == vc % FR, "inconsistent R1CS row"
                continue
            pb.gate(0, 0, 0, qo, va * vb % FR, -1, -1, sc, 0, 0, vcell)
        elif sa == -1:
            pb.gate(0, va, 0, qo, qc, -1, sb, sc, 0, vb, vcell)
        elif sb == -1:
            pb.gate(vb, 0, 0, qo, qc, sa, -1, sc, va, 0, vcell)
        else:
            pb.gate(0, 0, 1, qo, qc, sa, sb, sc, va, vb, vcell)

    # pad to a power of two, reserving the last TWO rows: fflonk_prove
    # blinds by overwriting wire evaluations at rows n-2 and n-1, so real
    # gates must never occupy them
    n = 8
    while n < pb.n_gates + 2:
        n *= 2
    while pb.n_gates < n:
        pb.gate(0, 0, 0, 0, 0, -1, -1, -1, 0, 0, 0)

    # sigma: cells holding the same signal form one rotation cycle
    sigma = list(range(3 * n))
    cells_by_sig: Dict[int, List[int]] = {}
    for col, sigs in enumerate((pb.a_sig, pb.b_sig, pb.c_sig)):
        for row, s in enumerate(sigs):
            if s >= 0:
                cells_by_sig.setdefault(s, []).append(col * n + row)
    for cells in cells_by_sig.values():
        if len(cells) > 1:
            for i, cell in enumerate(cells):
                sigma[cell] = cells[(i + 1) % len(cells)]

    cs = PlonkCS(n=n, qL=pb.qL, qR=pb.qR, qM=pb.qM, qO=pb.qO, qC=pb.qC,
                 sigma=sigma, n_public=n_public)
    return cs, pb.a_val, pb.b_val, pb.c_val

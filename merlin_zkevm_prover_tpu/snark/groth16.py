"""Groth16 prover over BN254 (reference src/rapidsnark/groth16.c.hpp:49-204).

Flow, identical to the reference:
  1. Build the A/B evaluation vectors from the coefficient table and the
     witness; C = A o B pointwise (R1CS satisfied on the domain).
  2. 3x (iFFT -> eta-coset shift -> FFT) to evaluate A, B, C on the odd
     coset; buffH = A o B - C there.
  3. 5 MSMs: pi_a (A table), pib1 (B1), pi_b (B2 over G2), C-table and H
     commitments folded into pi_c with the r/s blinding.

MSMs and FFTs run on device (snark/msm.py, snark/fft.py); the coefficient
scatter is a host pass (tiny next to the MSMs).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bn254_field as bf
from ..ops.bn254_field import FR
from . import curve, fft, msm
from .curve import F1, F2, Point


@dataclass
class Groth16Key:
    """Proving key (zkey) contents."""

    n_vars: int
    n_public: int          # number of public signals EXCLUDING the 1
    domain_bits: int
    # coefficient table: list of (m, constraint, signal, value)
    coefs: List[Tuple[int, int, int, int]]
    vk_alpha1: Point       # G1
    vk_beta1: Point
    vk_delta1: Point
    vk_beta2: Point        # G2
    vk_delta2: Point
    points_a: Point        # (n_vars,) G1
    points_b1: Point       # (n_vars,) G1
    points_b2: Point       # (n_vars,) G2
    points_c: Point        # (n_vars - n_public - 1,) G1
    points_h: Point        # (2^domain_bits,) G1


def _ints_to_limbs(vals: List[int]) -> jnp.ndarray:
    return bf.scalars_to_limbs([int(v) for v in vals])


def _g1_table_from_affine(pairs):
    import numpy as np

    from . import curve as cv
    from ..ops import bn254_field as bfld

    n = len(pairs)
    xs = bfld.from_int(bfld.FQ, [p[0] for p in pairs])
    ys = bfld.from_int(bfld.FQ, [p[1] for p in pairs])
    inf = jnp.asarray(
        np.array([1 if (p[0] == 0 and p[1] == 0) else 0 for p in pairs],
                 dtype=bool)
    )
    ones = bfld.mont_one(bfld.FQ, (n,))
    zs = jnp.where(inf[..., None], bfld.zeros((n,)), ones)
    return Point(xs, ys, zs)


def _g2_table_from_affine(pairs):
    import numpy as np

    from .curve import Fq2El
    from ..ops import bn254_field as bfld

    n = len(pairs)

    def comp(i, j):
        return bfld.from_int(bfld.FQ, [p[i][j] for p in pairs])

    inf = jnp.asarray(
        np.array([1 if all(v == 0 for c in p for v in c) else 0
                  for p in pairs], dtype=bool)
    )
    ones = bfld.mont_one(bfld.FQ, (n,))
    zs = Fq2El(jnp.where(inf[..., None], bfld.zeros((n,)), ones),
               bfld.zeros((n,)))
    return Point(Fq2El(comp(0, 0), comp(0, 1)),
                 Fq2El(comp(1, 0), comp(1, 1)), zs)


def key_from_zkey(zk) -> "Groth16Key":
    """snarkjs ZKeyData -> proving key (reference zkey_utils.cpp role)."""
    import math

    from .curve import F1, F2

    def g1(p):
        return curve.from_affine(F1, bf.from_int(bf.FQ, p[0]),
                                 bf.from_int(bf.FQ, p[1]))

    def g2(p):
        return curve.from_affine(F2, curve.Fq2El(
            bf.from_int(bf.FQ, p[0][0]), bf.from_int(bf.FQ, p[0][1])),
            curve.Fq2El(bf.from_int(bf.FQ, p[1][0]),
                        bf.from_int(bf.FQ, p[1][1])))

    domain_bits = int(math.log2(zk.domain_size))
    return Groth16Key(
        n_vars=zk.n_vars, n_public=zk.n_public, domain_bits=domain_bits,
        coefs=list(zk.coefs),
        vk_alpha1=g1(zk.alpha1), vk_beta1=g1(zk.beta1),
        vk_delta1=g1(zk.delta1), vk_beta2=g2(zk.beta2),
        vk_delta2=g2(zk.delta2),
        points_a=_g1_table_from_affine(zk.points_a),
        points_b1=_g1_table_from_affine(zk.points_b1),
        points_b2=_g2_table_from_affine(zk.points_b2),
        points_c=_g1_table_from_affine(zk.points_c) if zk.points_c else None,
        points_h=_g1_table_from_affine(zk.points_h),
    )


def key_to_zkey(key: Groth16Key):
    """Export a proving key as snarkjs ZKeyData (dev-setup interop)."""
    from .binfile import ZKeyData
    from .curve import F1, F2

    def aff1(p):
        x, y, inf = curve.to_affine(F1, p)
        if bool(np.asarray(inf).reshape(())):
            return (0, 0)
        return (int(F1.to_int(x)), int(F1.to_int(y)))

    def aff2(p):
        x, y, inf = curve.to_affine(F2, p)
        if bool(np.asarray(inf).reshape(())):
            return ((0, 0), (0, 0))
        xi = F2.to_int(x)
        yi = F2.to_int(y)
        return ((int(xi[0]), int(xi[1])), (int(yi[0]), int(yi[1])))

    def table1(pts):
        if pts is None:
            return []
        n = jax.tree_util.tree_leaves(pts.x)[0].shape[0]
        return [aff1(jax.tree_util.tree_map(lambda a: a[i], pts))
                for i in range(n)]

    def table2(pts):
        n = jax.tree_util.tree_leaves(pts.x)[0].shape[0]
        return [aff2(jax.tree_util.tree_map(lambda a: a[i], pts))
                for i in range(n)]

    return ZKeyData(
        n_vars=key.n_vars, n_public=key.n_public,
        domain_size=1 << key.domain_bits,
        alpha1=aff1(key.vk_alpha1), beta1=aff1(key.vk_beta1),
        delta1=aff1(key.vk_delta1), beta2=aff2(key.vk_beta2),
        gamma2=aff2(curve.g2_generator()), delta2=aff2(key.vk_delta2),
        ic=[], coefs=list(key.coefs),
        points_a=table1(key.points_a), points_b1=table1(key.points_b1),
        points_b2=table2(key.points_b2), points_c=table1(key.points_c),
        points_h=table1(key.points_h),
    )


def build_abc(key: Groth16Key, witness: List[int]):
    """A/B evaluation vectors on the constraint domain (host scatter)."""
    n = 1 << key.domain_bits
    pol_a = [0] * n
    pol_b = [0] * n
    for (m, c, s, v) in key.coefs:
        term = (v * witness[s]) % FR.mod
        if m == 0:
            pol_a[c] = (pol_a[c] + term) % FR.mod
        else:
            pol_b[c] = (pol_b[c] + term) % FR.mod
    return pol_a, pol_b


def prove(key: Groth16Key, witness: List[int],
          r: Optional[int] = None, s: Optional[int] = None) -> Dict:
    """Returns {"pi_a", "pi_b", "pi_c", "publics"} (affine coordinates)."""
    assert len(witness) == key.n_vars
    assert witness[0] == 1
    n = 1 << key.domain_bits
    if r is None:
        r = secrets.randbelow(FR.mod)
    if s is None:
        s = secrets.randbelow(FR.mod)

    # ---- H values on the eta-coset ----
    pol_a, pol_b = build_abc(key, witness)
    pol_c = [(a * b) % FR.mod for a, b in zip(pol_a, pol_b)]
    eta = fft.w_fr(key.domain_bits + 1)

    def coset_evals(vals):
        dev = bf.from_int(FR, vals)
        coeffs = fft.ifft(dev)
        shifted = fft.coset_scale(coeffs, eta)
        return fft.fft(shifted)

    a_odd = coset_evals(pol_a)
    b_odd = coset_evals(pol_b)
    c_odd = coset_evals(pol_c)
    h_vals_m = bf.sub(FR, bf.mont_mul(FR, a_odd, b_odd), c_odd)
    h_vals = bf.to_int(FR, h_vals_m)  # plain ints
    h_scalars = _ints_to_limbs([int(v) for v in h_vals])

    # ---- MSMs ----
    w_scalars = _ints_to_limbs([w % FR.mod for w in witness])
    pi_a_msm = msm.msm_jit(F1, key.points_a, w_scalars)
    pib1_msm = msm.msm_jit(F1, key.points_b1, w_scalars)
    pi_b_msm = msm.msm_jit(F2, key.points_b2, w_scalars)
    if key.points_c is not None and key.n_vars > key.n_public + 1:
        c_scalars = _ints_to_limbs(
            [w % FR.mod for w in witness[key.n_public + 1:]]
        )
        pi_c_msm = msm.msm_jit(F1, key.points_c, c_scalars)
    else:
        pi_c_msm = curve.infinity(F1, ())
    h_msm = msm.msm_jit(F1, key.points_h, h_scalars)

    # ---- blinding ----
    pi_a = curve.add(F1, pi_a_msm, key.vk_alpha1)
    pi_a = curve.add(F1, pi_a, curve.scalar_mul(F1, key.vk_delta1, r))
    pib1 = curve.add(F1, pib1_msm, key.vk_beta1)
    pib1 = curve.add(F1, pib1, curve.scalar_mul(F1, key.vk_delta1, s))
    pi_b = curve.add(F2, pi_b_msm, key.vk_beta2)
    pi_b = curve.add(F2, pi_b, curve.scalar_mul(F2, key.vk_delta2, s))

    pi_c = curve.add(F1, pi_c_msm, h_msm)
    pi_c = curve.add(F1, pi_c, curve.scalar_mul(F1, pi_a, s))
    pi_c = curve.add(F1, pi_c, curve.scalar_mul(F1, pib1, r))
    rs = (r * s) % FR.mod
    neg_rs_delta = curve.scalar_mul(F1, key.vk_delta1, FR.mod - rs)
    pi_c = curve.add(F1, pi_c, neg_rs_delta)

    ax, ay, _ = curve.to_affine(F1, pi_a)
    bx, by, _ = curve.to_affine(F2, pi_b)
    cx, cy, _ = curve.to_affine(F1, pi_c)
    return {
        "pi_a": [int(F1.to_int(ax)), int(F1.to_int(ay)), 1],
        "pi_b": [
            [int(v) for v in (F2.to_int(bx)[0], F2.to_int(bx)[1])],
            [int(v) for v in (F2.to_int(by)[0], F2.to_int(by)[1])],
            [1, 0],
        ],
        "pi_c": [int(F1.to_int(cx)), int(F1.to_int(cy)), 1],
        "publics": [int(w) for w in witness[1 : key.n_public + 1]],
        "protocol": "groth16",
        "curve": "bn128",
    }

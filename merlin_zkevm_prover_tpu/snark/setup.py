"""Development trusted setup (test/dev-mode zkey generation).

The reference consumes externally produced .zkey artifacts (prover.cpp:68).
This module generates a structurally identical proving key for any R1CS
from explicit toxic-waste scalars — for tests (the known dlogs let tests
check every proof point exactly in the exponent, no pairings needed) and
for dev-mode end-to-end runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ..ops import bn254_field as bf
from ..ops.bn254_field import FR
from . import curve, fft
from .curve import F1, F2, Point
from .groth16 import Groth16Key


@dataclass
class R1CS:
    """Constraints: for each c, (sum A[c]) * (sum B[c]) = (sum C[c]).

    a/b/c: list over constraints of {signal: coef} dicts.
    witness layout: [1, publics..., privates...].
    """

    n_vars: int
    n_public: int
    a: List[Dict[int, int]]
    b: List[Dict[int, int]]
    c: List[Dict[int, int]]


def _lagrange_evals_at(tau: int, n: int, mod: int) -> List[int]:
    """L_c(tau) for the size-n FFT domain."""
    w = fft.w_fr(n.bit_length() - 1)
    z = (pow(tau, n, mod) - 1) % mod
    out = []
    wi = 1
    n_inv = pow(n, mod - 2, mod)
    for _ in range(n):
        # L_i(tau) = z * w^i / (n * (tau - w^i))
        denom = (tau - wi) % mod
        out.append(z * wi % mod * n_inv % mod * pow(denom, mod - 2, mod) % mod)
        wi = wi * w % mod
    return out


def _points_g1(scalars: List[int]) -> Point:
    return curve.scalar_mul_table(
        F1, curve.g1_generator(), [s % FR.mod for s in scalars]
    )


def _points_g2(scalars: List[int]) -> Point:
    return curve.scalar_mul_table(
        F2, curve.g2_generator(), [s % FR.mod for s in scalars]
    )


def setup(r1cs: R1CS, tau: int = None, alpha: int = None, beta: int = None,
          delta: int = None, seed: int = 1234) -> Tuple[Groth16Key, Dict]:
    """Returns (key, toxic) — toxic only for tests/dev."""
    import random

    rng = random.Random(seed)
    mod = FR.mod
    tau = tau or rng.randrange(1, mod)
    alpha = alpha or rng.randrange(1, mod)
    beta = beta or rng.randrange(1, mod)
    delta = delta or rng.randrange(1, mod)

    n_cons = len(r1cs.a)
    domain_bits = max((n_cons - 1).bit_length(), 1)
    n = 1 << domain_bits

    lag = _lagrange_evals_at(tau, n, mod)

    # per-signal polynomial evaluations u_i(tau), v_i(tau), w_i(tau)
    u = [0] * r1cs.n_vars
    v = [0] * r1cs.n_vars
    wv = [0] * r1cs.n_vars
    coefs: List[Tuple[int, int, int, int]] = []
    for c in range(n_cons):
        for s, coef in r1cs.a[c].items():
            u[s] = (u[s] + coef * lag[c]) % mod
            coefs.append((0, c, s, coef % mod))
        for s, coef in r1cs.b[c].items():
            v[s] = (v[s] + coef * lag[c]) % mod
            coefs.append((1, c, s, coef % mod))
        for s, coef in r1cs.c[c].items():
            wv[s] = (wv[s] + coef * lag[c]) % mod

    dinv = pow(delta, mod - 2, mod)
    c_scalars = [
        ((beta * u[i] + alpha * v[i] + wv[i]) % mod) * dinv % mod
        for i in range(r1cs.n_public + 1, r1cs.n_vars)
    ]

    # H points: prepared so that sum_k buffH_k * H_k = [H(tau)*Z(tau)/delta]
    # with buffH_k = (A*B - C)(eta*w^k) = H(x_k) * Z(x_k):
    #   H_k = [ L^coset_k(tau) * Z(tau) / (Z(x_k) * delta) ]_1
    eta = fft.w_fr(domain_bits + 1)
    w = fft.w_fr(domain_bits)
    z_tau = (pow(tau, n, mod) - 1) % mod
    # coset vanishing poly: prod (x - eta w^k) = x^n - eta^n = x^n + 1
    zc_tau = (pow(tau, n, mod) + 1) % mod
    h_scalars = []
    xk = eta
    for k in range(n):
        # L^coset_k(tau) = zc(tau) * x_k / (n * (tau - x_k))  [same identity
        # as the plain domain but with the shifted points]
        lck = zc_tau * xk % mod * pow(n, mod - 2, mod) % mod
        lck = lck * pow((tau - xk) % mod, mod - 2, mod) % mod
        lck = lck * pow(pow(xk, n, mod), mod - 2, mod) % mod  # / x_k^n (= -1)
        z_xk = (pow(xk, n, mod) - 1) % mod
        h_scalars.append(
            lck * z_tau % mod * pow(z_xk, mod - 2, mod) % mod * dinv % mod
        )
        xk = xk * w % mod

    g1 = curve.g1_generator()
    g2 = curve.g2_generator()
    key = Groth16Key(
        n_vars=r1cs.n_vars,
        n_public=r1cs.n_public,
        domain_bits=domain_bits,
        coefs=coefs,
        vk_alpha1=curve.scalar_mul(F1, g1, alpha),
        vk_beta1=curve.scalar_mul(F1, g1, beta),
        vk_delta1=curve.scalar_mul(F1, g1, delta),
        vk_beta2=curve.scalar_mul(F2, g2, beta),
        vk_delta2=curve.scalar_mul(F2, g2, delta),
        points_a=_points_g1(u),
        points_b1=_points_g1(v),
        points_b2=_points_g2(v),
        points_c=_points_g1(c_scalars) if c_scalars else None,
        points_h=_points_g1(h_scalars),
    )
    toxic = {"tau": tau, "alpha": alpha, "beta": beta, "delta": delta,
             "u": u, "v": v, "w": wv}
    return key, toxic

"""Native fflonk prover/verifier over BN254 (reference
src/rapidsnark/fflonk_prover.c.hpp:1-1714, selected by zkey protocol ID 10
at src/prover/prover.cpp:59,887; the reference CI's acceptance test
verifies a fflonk final proof with snarkjs ffv).

fflonk commits three "combined" polynomials instead of eleven:

  C0(X) = qL(X^8) + X qR(X^8) + X^2 qM(X^8) + X^3 qO(X^8) + X^4 qC(X^8)
        + X^5 S1(X^8) + X^6 S2(X^8) + X^7 S3(X^8)          (setup, zkey)
  C1(X) = a(X^4) + X b(X^4) + X^2 c(X^4) + X^3 T0(X^4)     (round 1)
  C2(X) = z(X^3) + X T1(X^3) + X^2 T2(X^3)                 (round 2)

and opens them on coset root sets S0 (8th roots of xi), S1 (4th roots),
S2 (cube roots of xi and of xi*w) with a single KZG pair (W1, W2) —
rounds 3-5 (fflonk_prover.c.hpp:1153-1560).  The Fiat-Shamir transcript
is Keccak-256 over big-endian scalars and affine G1 coordinates
(keccak_256_transcript.c.hpp:33-78).

Host-side Fr polynomial arithmetic in exact Python ints (the final-stage
domain is small); curve ops via snark/pairing.py.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..utils.keccak import keccak256
from .pairing import (
    F12_ONE,
    G1_GEN,
    G2_GEN,
    Q,
    R as FR,
    g1_add,
    g1_mul,
    g1_neg,
    g2_mul,
    multi_pairing,
)

# ---------------------------------------------------------------------------
# Fr helpers
# ---------------------------------------------------------------------------


def _inv(x: int) -> int:
    return pow(x % FR, FR - 2, FR)


def _find_w(n: int) -> int:
    """Primitive n-th root of unity in Fr (n | 2^28)."""
    # 5 generates Fr*; 2-adicity of BN254 Fr is 28
    g = pow(5, (FR - 1) >> 28, FR)
    logn = n.bit_length() - 1
    assert 1 << logn == n
    return pow(g, 1 << (28 - logn), FR)


def _fft(vals: List[int], w: int) -> List[int]:
    n = len(vals)
    if n == 1:
        return list(vals)
    even = _fft(vals[0::2], w * w % FR)
    odd = _fft(vals[1::2], w * w % FR)
    out = [0] * n
    wk = 1
    for k in range(n // 2):
        t = wk * odd[k] % FR
        out[k] = (even[k] + t) % FR
        out[k + n // 2] = (even[k] - t) % FR
        wk = wk * w % FR
    return out


def _ifft(vals: List[int], w: int) -> List[int]:
    n = len(vals)
    inv_n = _inv(n)
    out = _fft(vals, _inv(w))
    return [v * inv_n % FR for v in out]


def poly_from_evals(evals: List[int]) -> List[int]:
    return _ifft(evals, _find_w(len(evals)))


def poly_eval(coefs: List[int], x: int) -> int:
    acc = 0
    for c in reversed(coefs):
        acc = (acc * x + c) % FR
    return acc


def poly_extend_evals(coefs: List[int], n_out: int) -> List[int]:
    c = list(coefs) + [0] * (n_out - len(coefs))
    return _fft(c, _find_w(n_out))


def poly_mul_scalar(coefs: List[int], k: int) -> List[int]:
    return [c * k % FR for c in coefs]


def poly_add(a: List[int], b: List[int]) -> List[int]:
    if len(a) < len(b):
        a, b = b, a
    out = list(a)
    for i, v in enumerate(b):
        out[i] = (out[i] + v) % FR
    return out


def poly_sub(a: List[int], b: List[int]) -> List[int]:
    return poly_add(a, [(-v) % FR for v in b])


def poly_div_zerofier(coefs: List[int], n: int, beta: int) -> List[int]:
    """Divide by (X^n - beta) (reference Polynomial::divByZerofier):
    synthetic division in X^n steps; raises if the remainder is nonzero.
    p = q*(X^n - beta) + r  =>  q_{i-n} = p_i + beta*q_i (high to low)."""
    p = [c % FR for c in coefs]
    q = [0] * max(len(p) - n, 0)
    for i in range(len(p) - 1, n - 1, -1):
        q[i - n] = (p[i] + beta * (q[i] if i < len(q) else 0)) % FR
    for i in range(min(n, len(p))):
        rem = (p[i] + beta * (q[i] if i < len(q) else 0)) % FR
        if rem != 0:
            raise ValueError("poly_div_zerofier: non-zero remainder")
    while q and q[-1] == 0:
        q.pop()
    return q


def poly_zerofier(points: List[int]) -> List[int]:
    out = [1]
    for p in points:
        nxt = [0] * (len(out) + 1)
        for i, c in enumerate(out):
            nxt[i] = (nxt[i] - p * c) % FR
            nxt[i + 1] = (nxt[i + 1] + c) % FR
        out = nxt
    return out


def lagrange_interp(xs: List[int], ys: List[int]) -> List[int]:
    """Exact Lagrange interpolation (reference
    Polynomial::lagrangePolynomialInterpolation — the R0/R1/R2 root sets
    are not FFT-friendly)."""
    n = len(xs)
    out = [0] * n
    for i in range(n):
        # numerator poly prod_{j!=i} (X - x_j)
        num = [1]
        denom = 1
        for j in range(n):
            if j == i:
                continue
            nxt = [0] * (len(num) + 1)
            for k, c in enumerate(num):
                nxt[k] = (nxt[k] - xs[j] * c) % FR
                nxt[k + 1] = (nxt[k + 1] + c) % FR
            num = nxt
            denom = denom * (xs[i] - xs[j]) % FR
        scale = ys[i] * _inv(denom) % FR
        for k in range(len(num)):
            out[k] = (out[k] + num[k] * scale) % FR
    return out


# ---------------------------------------------------------------------------
# Keccak-256 transcript (reference keccak_256_transcript.c.hpp)
# ---------------------------------------------------------------------------


class KeccakTranscript:
    def __init__(self):
        self.data = b""

    def reset(self):
        self.data = b""

    def add_scalar(self, v: int):
        self.data += int(v % FR).to_bytes(32, "big")

    def add_point(self, p):
        if p is None:
            self.data += b"\x00" * 64
        else:
            self.data += int(p[0]).to_bytes(32, "big")
            self.data += int(p[1]).to_bytes(32, "big")

    def get_challenge(self) -> int:
        return int.from_bytes(keccak256(self.data), "big") % FR


# ---------------------------------------------------------------------------
# PLONK constraint system + setup
# ---------------------------------------------------------------------------

K1 = 2
K2 = 3


@dataclass
class PlonkCS:
    """3-wire PLONK: qL a + qR b + qM ab + qO c + qC + PI = 0 per row,
    with copy constraints via the sigma permutation."""
    n: int
    qL: List[int]
    qR: List[int]
    qM: List[int]
    qO: List[int]
    qC: List[int]
    sigma: List[int]           # permutation over 3n wire slots
    n_public: int = 0


@dataclass
class FflonkKey:
    cs: PlonkCS
    srs_g1: List[Tuple[int, int]]   # tau^i * G1
    x2: tuple                       # tau * G2
    C0: Tuple[int, int]
    c0_coefs: List[int]
    sel_coefs: Dict[str, List[int]]
    sigma_coefs: List[List[int]]
    w: int                          # n-th root of unity


def _commit(srs: List, coefs: List[int]):
    acc = None
    for i, c in enumerate(coefs):
        if c % FR:
            acc = g1_add(acc, g1_mul(c, srs[i]))
    return acc


def _combine(polys: List[List[int]], stride: int, size: int) -> List[int]:
    """C(X) = sum_i X^i p_i(X^stride) (reference CPolynomial)."""
    out = [0] * (stride * size)
    for i, p in enumerate(polys):
        for j, c in enumerate(p):
            out[j * stride + i] = c % FR
    while out and out[-1] == 0:
        out.pop()
    return out


def fflonk_setup(cs: PlonkCS, seed: int = 0) -> FflonkKey:
    """Dev SRS + C0 commitment (the reference consumes a snarkjs zkey;
    zkey_fflonk.cpp sections map 1:1 onto this structure)."""
    n = cs.n
    rng = int.from_bytes(keccak256(b"fflonk-dev-srs" + seed.to_bytes(8, "big")), "big")
    tau = rng % FR
    max_deg = 9 * n + 32
    srs = []
    acc = 1
    for _ in range(max_deg):
        srs.append(g1_mul(acc, G1_GEN))
        acc = acc * tau % FR
    x2 = g2_mul(tau, G2_GEN)

    w = _find_w(n)
    sels = {k: poly_from_evals(getattr(cs, k)) for k in
            ("qL", "qR", "qM", "qO", "qC")}
    # sigma polys: slot value maps through k1/k2 cosets
    roots = [pow(w, i, FR) for i in range(n)]
    ids = roots + [r * K1 % FR for r in roots] + [r * K2 % FR for r in roots]
    sig_evals = [[ids[cs.sigma[col * n + i]] for i in range(n)]
                 for col in range(3)]
    sigmas = [poly_from_evals(se) for se in sig_evals]
    c0 = _combine([sels["qL"], sels["qR"], sels["qM"], sels["qO"],
                   sels["qC"], sigmas[0], sigmas[1], sigmas[2]], 8, n)
    return FflonkKey(cs=cs, srs_g1=srs, x2=x2, C0=_commit(srs, c0),
                     c0_coefs=c0, sel_coefs=sels, sigma_coefs=sigmas, w=w)


# ---------------------------------------------------------------------------
# Prover (reference rounds 1-5)
# ---------------------------------------------------------------------------


def fflonk_prove(key: FflonkKey, a_vals: List[int], b_vals: List[int],
                 c_vals: List[int], rand: Optional[bytes] = None) -> Dict:
    cs, n, w = key.cs, key.cs.n, key.w
    # rows n-2/n-1 are overwritten with blinding below; they must be
    # selector-free, copy-free padding (r1cs_to_plonk reserves them)
    for name in ("qL", "qR", "qM", "qO", "qC"):
        sel = getattr(cs, name)
        assert sel[n - 2] == 0 and sel[n - 1] == 0, (
            f"blinding rows carry live selector {name}")
    for col in range(3):
        for row in (n - 2, n - 1):
            assert cs.sigma[col * n + row] == col * n + row, (
                "blinding rows participate in a copy cycle")
    assert len(a_vals) <= n - 2 and len(b_vals) <= n - 2 and \
        len(c_vals) <= n - 2, "wire values extend into the blinding rows"
    rnd = rand or os.urandom(32 * 10)
    b = [0] + [int.from_bytes(keccak256(rnd + bytes([i])), "big") % FR
               for i in range(1, 10)]

    # ---- round 1: wire polys + T0 + C1 (:635-815) ----
    bufA = [v % FR for v in a_vals] + [0] * (n - len(a_vals))
    bufB = [v % FR for v in b_vals] + [0] * (n - len(b_vals))
    bufC = [v % FR for v in c_vals] + [0] * (n - len(c_vals))
    bufA[n - 2], bufA[n - 1] = b[2], b[1]
    bufB[n - 2], bufB[n - 1] = b[4], b[3]
    bufC[n - 2], bufC[n - 1] = b[6], b[5]
    A = poly_from_evals(bufA)
    B = poly_from_evals(bufB)
    C = poly_from_evals(bufC)

    n4 = 4 * n
    evA = poly_extend_evals(A, n4)
    evB = poly_extend_evals(B, n4)
    evC = poly_extend_evals(C, n4)
    ev = {k: poly_extend_evals(key.sel_coefs[k], n4)
          for k in ("qL", "qR", "qM", "qO", "qC")}
    # lagrange basis evals for publics: L_j on the 4n domain
    lag = []
    for j in range(cs.n_public):
        lj = [0] * n
        lj[j] = 1
        lag.append(poly_extend_evals(poly_from_evals(lj), n4))
    t0_ev = []
    for i in range(n4):
        pi = 0
        for j in range(cs.n_public):
            pi = (pi - lag[j][i] * bufA[j]) % FR
        t0 = (evA[i] * ev["qL"][i] + evB[i] * ev["qR"][i]
              + evA[i] * evB[i] % FR * ev["qM"][i]
              + evC[i] * ev["qO"][i] + ev["qC"][i] + pi) % FR
        t0_ev.append(t0)
    T0 = poly_div_zerofier(poly_from_evals(t0_ev), n, 1)
    C1_coefs = _combine([A, B, C, T0], 4, 2 * n)
    C1 = _commit(key.srs_g1, C1_coefs)

    # ---- round 2: beta/gamma, Z, T1, T2, C2 (:817-1150) ----
    tr = KeccakTranscript()
    tr.add_point(key.C0)
    for j in range(cs.n_public):
        tr.add_scalar(bufA[j])
    tr.add_point(C1)
    beta = tr.get_challenge()
    tr.reset()
    tr.add_scalar(beta)
    gamma = tr.get_challenge()

    sig_ev4 = [poly_extend_evals(s, n4) for s in key.sigma_coefs]
    num = [1] * n
    den = [1] * n
    for i in range(n):
        om = pow(w, i, FR)
        bw = beta * om % FR
        num[i] = ((bufA[i] + bw + gamma)
                  * (bufB[i] + K1 * bw + gamma) % FR
                  * (bufC[i] + K2 * bw + gamma)) % FR
        den[i] = ((bufA[i] + beta * sig_ev4[0][4 * i] + gamma)
                  * (bufB[i] + beta * sig_ev4[1][4 * i] + gamma) % FR
                  * (bufC[i] + beta * sig_ev4[2][4 * i] + gamma)) % FR
    z_ev = [1] * n
    accn, accd = 1, 1
    for i in range(n - 1):
        accn = accn * num[i] % FR
        accd = accd * den[i] % FR
        z_ev[i + 1] = accn * _inv(accd) % FR
    total = accn * num[n - 1] % FR * _inv(accd * den[n - 1] % FR) % FR
    if total != 1:
        raise ValueError("copy constraints do not match")
    Z = poly_from_evals(z_ev)
    # blind z: z += (b7 X^2 + b8 X + b9) * Z_H
    Zb = list(Z) + [0] * 3
    for (k, bf) in ((2, b[7]), (1, b[8]), (0, b[9])):
        Zb[n + k] = (Zb[n + k] + bf) % FR
        Zb[k] = (Zb[k] - bf) % FR
    Z = Zb
    evZ4 = poly_extend_evals(Z, n4)

    # T1 := (z - 1) L1 / ZH.  The reference splits T1/T1z on the 2n
    # domain (:980-1035) because its z evals are pre-blinding; here z is
    # blinded as a polynomial (deg n+2), so (z-1)*L1 has degree 2n+1 —
    # evaluate on the 4n domain instead (no aliasing, same polynomial).
    lag1_4 = poly_extend_evals(poly_from_evals([1] + [0] * (n - 1)), n4)
    t1_ev = [(evZ4[i] - 1) * lag1_4[i] % FR for i in range(n4)]
    T1 = poly_div_zerofier(poly_from_evals(t1_ev), n, 1)

    # T2 on the 4n domain (:1035-1131)
    w4n = _find_w(n4)
    t2_ev = []
    for i in range(n4):
        om = pow(w4n, i, FR)
        bX = beta * om % FR
        zw_i = evZ4[(i + 4) % n4]
        e1 = ((evA[i] + bX + gamma) * (evB[i] + K1 * bX + gamma) % FR
              * (evC[i] + K2 * bX + gamma) % FR * evZ4[i]) % FR
        e2 = ((evA[i] + beta * sig_ev4[0][i] + gamma)
              * (evB[i] + beta * sig_ev4[1][i] + gamma) % FR
              * (evC[i] + beta * sig_ev4[2][i] + gamma) % FR * zw_i) % FR
        t2_ev.append((e1 - e2) % FR)
    T2 = poly_div_zerofier(poly_from_evals(t2_ev), n, 1)
    C2_coefs = _combine([Z, T1, T2], 3, 3 * n + 3)
    C2 = _commit(key.srs_g1, C2_coefs)

    # ---- round 3: xi + evaluations (:1153-1238) ----
    tr.reset()
    tr.add_scalar(gamma)
    tr.add_point(C2)
    xi_seed = tr.get_challenge()
    xs2 = xi_seed * xi_seed % FR
    w8 = _find_w(8)
    w4_ = _find_w(4)
    w3 = pow(5, (FR - 1) // 3, FR)
    h0 = [xs2 * xi_seed % FR]
    for i in range(1, 8):
        h0.append(h0[0] * pow(w8, i, FR) % FR)
    h1 = [h0[0] * h0[0] % FR]
    for i in range(1, 4):
        h1.append(h1[0] * pow(w4_, i, FR) % FR)
    h2 = [h1[0] * xs2 % FR]
    h2 += [h2[0] * w3 % FR, h2[0] * w3 % FR * w3 % FR]
    # wr: cube root of w so that h3^3 = xi*w (reference zkey->wr); the
    # domain root w has 2-power order n, and 3 is invertible mod n
    wr = pow(w, pow(3, -1, cs.n), FR)
    h3 = [h2[0] * wr % FR]
    h3 += [h3[0] * w3 % FR, h3[0] * w3 % FR * w3 % FR]
    xi = h2[0] * h2[0] % FR * h2[0] % FR

    evals = {
        "ql": poly_eval(key.sel_coefs["qL"], xi),
        "qr": poly_eval(key.sel_coefs["qR"], xi),
        "qm": poly_eval(key.sel_coefs["qM"], xi),
        "qo": poly_eval(key.sel_coefs["qO"], xi),
        "qc": poly_eval(key.sel_coefs["qC"], xi),
        "s1": poly_eval(key.sigma_coefs[0], xi),
        "s2": poly_eval(key.sigma_coefs[1], xi),
        "s3": poly_eval(key.sigma_coefs[2], xi),
        "a": poly_eval(A, xi),
        "b": poly_eval(B, xi),
        "c": poly_eval(C, xi),
        "z": poly_eval(Z, xi),
    }
    xiw = xi * w % FR
    evals["zw"] = poly_eval(Z, xiw)
    evals["t1w"] = poly_eval(T1, xiw)
    evals["t2w"] = poly_eval(T2, xiw)

    # ---- round 4: alpha, R0/R1/R2, F, W1 (:1241-1420) ----
    tr.reset()
    tr.add_scalar(xi_seed)
    for k in ("ql", "qr", "qm", "qo", "qc", "s1", "s2", "s3", "a", "b",
              "c", "z", "zw", "t1w", "t2w"):
        tr.add_scalar(evals[k])
    alpha = tr.get_challenge()

    R0 = lagrange_interp(h0, [poly_eval(key.c0_coefs, x) for x in h0])
    R1 = lagrange_interp(h1, [poly_eval(C1_coefs, x) for x in h1])
    R2 = lagrange_interp(h2 + h3, [poly_eval(C2_coefs, x) for x in h2 + h3])

    alpha2 = alpha * alpha % FR
    F = poly_mul_scalar(poly_sub(C2_coefs, R2), alpha2)
    F = poly_div_zerofier(F, 3, xi)
    F = poly_div_zerofier(F, 3, xiw)
    tmp = poly_mul_scalar(poly_sub(C1_coefs, R1), alpha)
    tmp = poly_div_zerofier(tmp, 4, xi)
    F = poly_add(F, tmp)
    tmp = poly_div_zerofier(poly_sub(key.c0_coefs, R0), 8, xi)
    F = poly_add(F, tmp)
    W1 = _commit(key.srs_g1, F)

    # ---- round 5: y, L, W2 (:1420-1560) ----
    tr.reset()
    tr.add_scalar(alpha)
    tr.add_point(W1)
    y = tr.get_challenge()

    mulL0 = 1
    for x in h0:
        mulL0 = mulL0 * (y - x) % FR
    mulL1 = 1
    for x in h1:
        mulL1 = mulL1 * (y - x) % FR
    mulL2 = 1
    for x in h2 + h3:
        mulL2 = mulL2 * (y - x) % FR
    preL0 = mulL1 * mulL2 % FR
    preL1 = alpha * mulL0 % FR * mulL2 % FR
    preL2 = alpha2 * mulL0 % FR * mulL1 % FR

    L = poly_mul_scalar(poly_sub(C2_coefs, [poly_eval(R2, y)]), preL2)
    L = poly_add(L, poly_mul_scalar(
        poly_sub(C1_coefs, [poly_eval(R1, y)]), preL1))
    L = poly_add(L, poly_mul_scalar(
        poly_sub(key.c0_coefs, [poly_eval(R0, y)]), preL0))
    ZT = poly_zerofier(h0 + h1 + h2 + h3)
    L = poly_sub(L, poly_mul_scalar(F, poly_eval(ZT, y)))
    ZTS2 = poly_zerofier(h1 + h2 + h3)
    L = poly_mul_scalar(L, _inv(poly_eval(ZTS2, y)))
    W2 = _commit(key.srs_g1, poly_div_zerofier(L, 1, y))

    return {
        "protocol": "fflonk",
        "C1": C1, "C2": C2, "W1": W1, "W2": W2,
        "evals": evals,
        "publics": [bufA[j] for j in range(cs.n_public)],
    }


# ---------------------------------------------------------------------------
# Verifier (snarkjs fflonk_verify role — the CI acceptance step)
# ---------------------------------------------------------------------------


def fflonk_verify(key: FflonkKey, proof: Dict) -> bool:
    cs, n, w = key.cs, key.cs.n, key.w
    ev = proof["evals"]
    publics = [int(x) % FR for x in proof["publics"]]
    C1, C2, W1, W2 = (proof["C1"], proof["C2"], proof["W1"], proof["W2"])
    for p in (C1, C2, W1, W2):
        if p is None or (p[1] * p[1] - p[0] ** 3 - 3) % Q != 0:
            return False

    # replay the transcript
    tr = KeccakTranscript()
    tr.add_point(key.C0)
    for v in publics:
        tr.add_scalar(v)
    tr.add_point(C1)
    beta = tr.get_challenge()
    tr.reset()
    tr.add_scalar(beta)
    gamma = tr.get_challenge()
    tr.reset()
    tr.add_scalar(gamma)
    tr.add_point(C2)
    xi_seed = tr.get_challenge()
    xs2 = xi_seed * xi_seed % FR
    w8 = _find_w(8)
    w4_ = _find_w(4)
    w3 = pow(5, (FR - 1) // 3, FR)
    h0 = [xs2 * xi_seed % FR]
    for i in range(1, 8):
        h0.append(h0[0] * pow(w8, i, FR) % FR)
    h1 = [h0[0] * h0[0] % FR]
    for i in range(1, 4):
        h1.append(h1[0] * pow(w4_, i, FR) % FR)
    h2 = [h1[0] * xs2 % FR]
    h2 += [h2[0] * w3 % FR, h2[0] * w3 % FR * w3 % FR]
    wr = pow(w, pow(3, -1, cs.n), FR)
    h3 = [h2[0] * wr % FR]
    h3 += [h3[0] * w3 % FR, h3[0] * w3 % FR * w3 % FR]
    xi = h2[0] * h2[0] % FR * h2[0] % FR
    xiw = xi * w % FR

    tr.reset()
    tr.add_scalar(xi_seed)
    for k in ("ql", "qr", "qm", "qo", "qc", "s1", "s2", "s3", "a", "b",
              "c", "z", "zw", "t1w", "t2w"):
        tr.add_scalar(ev[k])
    alpha = tr.get_challenge()
    tr.reset()
    tr.add_scalar(alpha)
    tr.add_point(W1)
    y = tr.get_challenge()

    # derive t0/t1/t2 at xi from the committed evaluations (verifier
    # steps 6-8: the identities hold iff these are the Ti openings)
    zh = (pow(xi, n, FR) - 1) % FR
    lag1 = (pow(xi, n, FR) - 1) * _inv(n * (xi - 1) % FR) % FR
    pi_xi = 0
    wk = 1
    for j, pub in enumerate(publics):
        lj = (pow(xi, n, FR) - 1) * wk % FR * _inv(n * (xi - wk) % FR) % FR
        pi_xi = (pi_xi - lj * pub) % FR
        wk = wk * w % FR
    t0 = (ev["ql"] * ev["a"] + ev["qr"] * ev["b"]
          + ev["qm"] * ev["a"] % FR * ev["b"]
          + ev["qo"] * ev["c"] + ev["qc"] + pi_xi) % FR * _inv(zh) % FR
    t1 = (ev["z"] - 1) * lag1 % FR * _inv(zh) % FR
    e1 = ((ev["a"] + beta * xi + gamma)
          * (ev["b"] + K1 * beta % FR * xi + gamma) % FR
          * (ev["c"] + K2 * beta % FR * xi + gamma) % FR * ev["z"]) % FR
    e2 = ((ev["a"] + beta * ev["s1"] + gamma)
          * (ev["b"] + beta * ev["s2"] + gamma) % FR
          * (ev["c"] + beta * ev["s3"] + gamma) % FR * ev["zw"]) % FR
    t2 = (e1 - e2) % FR * _inv(zh) % FR

    # rebuild R0/R1/R2 openings from the evaluation set
    c0_at = lambda x: (ev["ql"] + x * ev["qr"] + pow(x, 2, FR) * ev["qm"]
                       + pow(x, 3, FR) * ev["qo"] + pow(x, 4, FR) * ev["qc"]
                       + pow(x, 5, FR) * ev["s1"] + pow(x, 6, FR) * ev["s2"]
                       + pow(x, 7, FR) * ev["s3"]) % FR
    c1_at = lambda x: (ev["a"] + x * ev["b"] + pow(x, 2, FR) * ev["c"]
                       + pow(x, 3, FR) * t0) % FR
    c2_at = lambda x: (ev["z"] + x * t1 + pow(x, 2, FR) * t2) % FR
    c2w_at = lambda x: (ev["zw"] + x * ev["t1w"]
                        + pow(x, 2, FR) * ev["t2w"]) % FR
    R0 = lagrange_interp(h0, [c0_at(x) for x in h0])
    R1 = lagrange_interp(h1, [c1_at(x) for x in h1])
    R2 = lagrange_interp(h2 + h3, [c2_at(x) for x in h2]
                         + [c2w_at(x) for x in h3])

    mulL0 = 1
    for x in h0:
        mulL0 = mulL0 * (y - x) % FR
    mulL1 = 1
    for x in h1:
        mulL1 = mulL1 * (y - x) % FR
    mulL2 = 1
    for x in h2 + h3:
        mulL2 = mulL2 * (y - x) % FR
    alpha2 = alpha * alpha % FR
    preL0 = mulL1 * mulL2 % FR
    preL1 = alpha * mulL0 % FR * mulL2 % FR
    preL2 = alpha2 * mulL0 % FR * mulL1 % FR

    # [L']_1 = preL0 (C0 - r0(y) G) + preL1 (C1 - r1(y) G)
    #        + preL2 (C2 - r2(y) G) - ZT(y) W1
    zt_y = poly_eval(poly_zerofier(h0 + h1 + h2 + h3), y)
    zts2_y = poly_eval(poly_zerofier(h1 + h2 + h3), y)
    acc = g1_mul(preL0, key.C0)
    acc = g1_add(acc, g1_mul(preL1, C1))
    acc = g1_add(acc, g1_mul(preL2, C2))
    s = (preL0 * poly_eval(R0, y) + preL1 * poly_eval(R1, y)
         + preL2 * poly_eval(R2, y)) % FR
    acc = g1_add(acc, g1_neg(g1_mul(s, G1_GEN)))
    acc = g1_add(acc, g1_neg(g1_mul(zt_y, W1)))
    # L'(X) = zts2(y) * W2(X) * (X - y)
    #   e(L' + y*zts2(y)*W2, [1]_2) == e(zts2(y)*W2, [tau]_2)
    lhs = g1_add(acc, g1_mul(y * zts2_y % FR, W2))
    rhs_pt = g1_mul(zts2_y, W2)
    out = multi_pairing([
        (G2_GEN, lhs),
        (key.x2, g1_neg(rhs_pt)),
    ])
    return out == F12_ONE

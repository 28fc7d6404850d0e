"""BN254 optimal-ate pairing (host python ints) + Groth16 verification.

The reference delegates final-proof verification to snarkjs in CI
(prover_e2e.yml last step); this module gives the framework a native
verifier: tower fields Fq2 / Fq6 / Fq12 (u^2 = -1, v^3 = 9 + u, w^2 = v),
Miller loop over 6x+2 with the two Frobenius correction lines, and final
exponentiation.  Verification volume is four pairings per proof, far off
any hot path, so plain python ints are the right tool.
"""

from __future__ import annotations

from typing import List, Tuple

Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN_X = 4965661367192848881
ATE_LOOP = 6 * BN_X + 2

# ---------------------------------------------------------------------------
# Fq2 = Fq[u]/(u^2+1); elements (a, b) = a + b*u
# ---------------------------------------------------------------------------


def f2_add(a, b):
    return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)


def f2_sub(a, b):
    return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)


def f2_neg(a):
    return ((-a[0]) % Q, (-a[1]) % Q)


def f2_mul(a, b):
    t0 = a[0] * b[0] % Q
    t1 = a[1] * b[1] % Q
    t2 = (a[0] + a[1]) * (b[0] + b[1]) % Q
    return ((t0 - t1) % Q, (t2 - t0 - t1) % Q)


def f2_sqr(a):
    return f2_mul(a, a)


def f2_scalar(a, k):
    return (a[0] * k % Q, a[1] * k % Q)


def f2_inv(a):
    d = pow((a[0] * a[0] + a[1] * a[1]) % Q, Q - 2, Q)
    return (a[0] * d % Q, (-a[1] * d) % Q)


def f2_conj(a):
    return (a[0], (-a[1]) % Q)


F2_ONE = (1, 0)
F2_ZERO = (0, 0)
XI = (9, 1)  # v^3 = xi

# ---------------------------------------------------------------------------
# Fq6 = Fq2[v]/(v^3 - xi); elements (c0, c1, c2)
# ---------------------------------------------------------------------------


def f6_add(a, b):
    return tuple(f2_add(x, y) for x, y in zip(a, b))


def f6_sub(a, b):
    return tuple(f2_sub(x, y) for x, y in zip(a, b))


def f6_neg(a):
    return tuple(f2_neg(x) for x in a)


def f6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = f2_mul(a0, b0)
    t1 = f2_mul(a1, b1)
    t2 = f2_mul(a2, b2)
    c0 = f2_add(t0, f2_mul(XI, f2_sub(
        f2_mul(f2_add(a1, a2), f2_add(b1, b2)), f2_add(t1, t2))))
    c1 = f2_add(f2_sub(f2_mul(f2_add(a0, a1), f2_add(b0, b1)),
                       f2_add(t0, t1)), f2_mul(XI, t2))
    c2 = f2_add(f2_sub(f2_mul(f2_add(a0, a2), f2_add(b0, b2)),
                       f2_add(t0, t2)), t1)
    return (c0, c1, c2)


def f6_mul_xi(a):
    """a * v."""
    return (f2_mul(XI, a[2]), a[0], a[1])


def f6_inv(a):
    a0, a1, a2 = a
    t0 = f2_sqr(a0)
    t1 = f2_sqr(a1)
    t2 = f2_sqr(a2)
    t3 = f2_mul(a0, a1)
    t4 = f2_mul(a0, a2)
    t5 = f2_mul(a1, a2)
    c0 = f2_sub(t0, f2_mul(XI, t5))
    c1 = f2_sub(f2_mul(XI, t2), t3)
    c2 = f2_sub(t1, t4)
    d = f2_add(f2_mul(a0, c0),
               f2_mul(XI, f2_add(f2_mul(a2, c1), f2_mul(a1, c2))))
    dinv = f2_inv(d)
    return (f2_mul(c0, dinv), f2_mul(c1, dinv), f2_mul(c2, dinv))


F6_ZERO = (F2_ZERO, F2_ZERO, F2_ZERO)
F6_ONE = (F2_ONE, F2_ZERO, F2_ZERO)

# ---------------------------------------------------------------------------
# Fq12 = Fq6[w]/(w^2 - v); elements (c0, c1)
# ---------------------------------------------------------------------------


def f12_mul(a, b):
    t0 = f6_mul(a[0], b[0])
    t1 = f6_mul(a[1], b[1])
    c0 = f6_add(t0, f6_mul_xi(t1))
    c1 = f6_sub(f6_mul(f6_add(a[0], a[1]), f6_add(b[0], b[1])),
                f6_add(t0, t1))
    return (c0, c1)


def f12_sqr(a):
    return f12_mul(a, a)


def f12_inv(a):
    t = f6_inv(f6_sub(f6_mul(a[0], a[0]), f6_mul_xi(f6_mul(a[1], a[1]))))
    return (f6_mul(a[0], t), f6_neg(f6_mul(a[1], t)))


def f12_pow(a, e: int):
    out = F12_ONE
    base = a
    while e:
        if e & 1:
            out = f12_mul(out, base)
        base = f12_sqr(base)
        e >>= 1
    return out


F12_ONE = (F6_ONE, F6_ZERO)

def _f2_pow(a, e):
    out = F2_ONE
    base = a
    while e:
        if e & 1:
            out = f2_mul(out, base)
        base = f2_sqr(base)
        e >>= 1
    return out


_XI_Q13 = _f2_pow(XI, (Q - 1) // 3)
_XI_Q12 = _f2_pow(XI, (Q - 1) // 2)


def g2_frobenius(p):
    """pi(x, y) = (x^q * xi^((q-1)/3), y^q * xi^((q-1)/2))."""
    x, y = p
    return (f2_mul(f2_conj(x), _XI_Q13), f2_mul(f2_conj(y), _XI_Q12))


# ---------------------------------------------------------------------------
# Miller loop (affine line evaluations — clarity over speed)
# ---------------------------------------------------------------------------


# embedding-based pairing: map G2 (on the twist) into E(Fq12) and run a
# textbook Miller loop there — slower but unambiguous
_W2 = ((F2_ZERO, F2_ONE, F2_ZERO), F6_ZERO)        # w^2 = v
_W3 = (F6_ZERO, (F2_ZERO, F2_ONE, F2_ZERO))        # w^3 = v*w


def f12_from_f2(a):
    return (((a[0], a[1]), F2_ZERO, F2_ZERO), F6_ZERO)


def f12_from_int(n):
    return f12_from_f2((n % Q, 0))


def twist_to_e12(p):
    """Untwist a G2 point (x', y') on y^2 = x^3 + 3/xi to E(Fq12):
    psi(x', y') = (x'*w^2, y'*w^3) since w^6 = xi."""
    x, y = p
    xx = f12_mul(f12_from_f2(x), _W2)
    yy = f12_mul(f12_from_f2(y), _W3)
    return (xx, yy)


def f12_eq(a, b):
    return a == b


def _e12_double(pt):
    x, y = pt
    lam = f12_mul(f12_mul(f12_sqr(x), f12_from_int(3)),
                  f12_inv(f12_mul(y, f12_from_int(2))))
    x3 = f12_sub2(f12_sqr(lam), f12_mul(x, f12_from_int(2)))
    y3 = f12_sub2(f12_mul(lam, f12_sub2(x, x3)), y)
    return (x3, y3), lam


def _e12_add(p1, p2):
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if y1 == y2:
            return _e12_double(p1)
        return None, None
    lam = f12_mul(f12_sub2(y2, y1), f12_inv(f12_sub2(x2, x1)))
    x3 = f12_sub2(f12_sub2(f12_sqr(lam), x1), x2)
    y3 = f12_sub2(f12_mul(lam, f12_sub2(x1, x3)), y1)
    return (x3, y3), lam


def f12_sub2(a, b):
    return (f6_sub(a[0], b[0]), f6_sub(a[1], b[1]))


def _line_eval(pt, lam, p_g1):
    """y - y1 - lam*(x - x1) at the embedded G1 point."""
    x1, y1 = pt
    px, py = p_g1
    xp = f12_from_int(px)
    yp = f12_from_int(py)
    return f12_sub2(f12_sub2(yp, y1), f12_mul(lam, f12_sub2(xp, x1)))


def miller_loop(q_g2, p_g1) -> tuple:
    """f_{6x+2, Q}(P) with the two frobenius correction steps."""
    if q_g2 is None or p_g1 is None:
        return F12_ONE
    q12 = twist_to_e12(q_g2)
    t = q12
    f = F12_ONE
    bits = bin(ATE_LOOP)[3:]
    for b in bits:
        (t2, lam) = _e12_double(t)
        f = f12_mul(f12_sqr(f), _line_eval(t, lam, p_g1))
        t = t2
        if b == "1":
            t2, lam = _e12_add(t, q12)
            f = f12_mul(f, _line_eval(t, lam, p_g1))
            t = t2
    # frobenius corrections: Q1 = pi(Q), Q2 = -pi^2(Q)
    q1 = g2_frobenius(q_g2)
    q2 = g2_frobenius(q1)
    q2 = (q2[0], f2_neg(q2[1]))
    q1_12 = twist_to_e12(q1)
    q2_12 = twist_to_e12(q2)
    t2, lam = _e12_add(t, q1_12)
    f = f12_mul(f, _line_eval(t, lam, p_g1))
    t = t2
    t2, lam = _e12_add(t, q2_12)
    f = f12_mul(f, _line_eval(t, lam, p_g1))
    return f


def final_exponentiation(f) -> tuple:
    return f12_pow(f, (Q ** 12 - 1) // R)


def pairing(q_g2, p_g1) -> tuple:
    return final_exponentiation(miller_loop(q_g2, p_g1))


def multi_pairing(pairs: List[Tuple]) -> tuple:
    """prod e(Q_i, P_i): one shared final exponentiation."""
    f = F12_ONE
    for (q_g2, p_g1) in pairs:
        f = f12_mul(f, miller_loop(q_g2, p_g1))
    return final_exponentiation(f)


# ---------------------------------------------------------------------------
# Groth16 verification
# ---------------------------------------------------------------------------

G1_GEN = (1, 2)
G2_GEN = (
    (10857046999023057135944570762232829481370756359578518086990519993285655852781,
     11559732032986387107991004021392285783925812861821192530917403151452391805634),
    (8495653923123431417604973247489272438418190587263600148770280649306958101930,
     4082367875863433681332203403145435568316851327593401208105741076214120093531),
)


def g1_neg(p):
    if p is None:
        return None
    return (p[0], (-p[1]) % Q)


def g1_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        lam = 3 * x1 * x1 % Q * pow(2 * y1 % Q, Q - 2, Q) % Q
    else:
        lam = (y2 - y1) % Q * pow((x2 - x1) % Q, Q - 2, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    y3 = (lam * (x1 - x3) - y1) % Q
    return (x3, y3)


def g1_mul(k: int, p):
    k %= R
    acc = None
    base = p
    while k:
        if k & 1:
            acc = g1_add(acc, base)
        base = g1_add(base, base)
        k >>= 1
    return acc


def g2_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if f2_add(y1, y2) == F2_ZERO:
            return None
        lam = f2_mul(f2_scalar(f2_sqr(x1), 3), f2_inv(f2_scalar(y1, 2)))
    else:
        lam = f2_mul(f2_sub(y2, y1), f2_inv(f2_sub(x2, x1)))
    x3 = f2_sub(f2_sub(f2_sqr(lam), x1), x2)
    y3 = f2_sub(f2_mul(lam, f2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_mul(k: int, p):
    k %= R
    acc = None
    base = p
    while k:
        if k & 1:
            acc = g2_add(acc, base)
        base = g2_add(base, base)
        k >>= 1
    return acc


def _g1_valid(p) -> bool:
    """On-curve check for an affine BN254 G1 point (y^2 = x^3 + 3).
    G1 has prime order on BN254, so on-curve implies in-subgroup."""
    try:
        x, y = int(p[0]) % Q, int(p[1]) % Q
    except (TypeError, ValueError, IndexError):
        return False
    return (y * y - x * x * x - 3) % Q == 0


def _g2_valid(p) -> bool:
    """On-curve + r-order subgroup check for an affine G2 point over Fq2
    (y^2 = x^3 + 3/(9+u); G2's curve order is not prime, so the subgroup
    check [r]P = O is required for adversarial inputs)."""
    try:
        x = tuple(int(v) % Q for v in p[0])
        y = tuple(int(v) % Q for v in p[1])
        if len(x) != 2 or len(y) != 2:
            return False
    except (TypeError, ValueError):
        return False
    b2 = f2_mul((3, 0), f2_inv((9, 1)))
    lhs = f2_sub(f2_sqr(y), f2_mul(f2_sqr(x), x))
    if lhs != tuple(v % Q for v in b2):
        return False
    # [r]P == O, without g2_mul's mod-r scalar reduction
    acc, base, k = None, (x, y), R
    while k:
        if k & 1:
            acc = g2_add(acc, base)
        base = g2_add(base, base)
        k >>= 1
    return acc is None


def groth16_verify(vk: dict, proof: dict) -> bool:
    """vk: {alpha1, beta2, gamma2, delta2, ic: [G1]}; proof: {pi_a, pi_b,
    pi_c, publics}.  Checks e(A,B) = e(alpha,beta) e(acc,gamma) e(C,delta).

    Proof points are validated first (on-curve, and r-order subgroup for
    G2): a malformed adversarial proof returns False instead of crashing
    the pairing (reference snarkjs acceptance-step behavior).
    """
    publics = [int(x) for x in proof["publics"]]
    ic = vk["ic"]
    assert len(ic) == len(publics) + 1
    acc = ic[0]
    for x, pt in zip(publics, ic[1:]):
        acc = g1_add(acc, g1_mul(x, pt))
    pi_a = tuple(int(v) for v in proof["pi_a"][:2])
    pi_c = tuple(int(v) for v in proof["pi_c"][:2])
    pi_b = (tuple(int(v) for v in proof["pi_b"][0]),
            tuple(int(v) for v in proof["pi_b"][1]))
    if not (_g1_valid(pi_a) and _g1_valid(pi_c) and _g2_valid(pi_b)):
        return False
    out = multi_pairing([
        (pi_b, g1_neg(pi_a)),
        (vk["beta2"], vk["alpha1"]),
        (vk["gamma2"], acc),
        (vk["delta2"], pi_c),
    ])
    return out == F12_ONE


def make_vk(toxic: dict, n_public: int) -> dict:
    """Verifying key from setup toxic scalars (snark/setup.py uses an
    implicit gamma = 1): ic_i = (beta*u_i + alpha*v_i + w_i) * G1."""
    u, v, w = toxic["u"], toxic["v"], toxic["w"]
    alpha, beta, delta = toxic["alpha"], toxic["beta"], toxic["delta"]
    ic = [
        g1_mul((beta * u[i] + alpha * v[i] + w[i]) % R, G1_GEN)
        for i in range(n_public + 1)
    ]
    return {
        "alpha1": g1_mul(alpha, G1_GEN),
        "beta2": g2_mul(beta, G2_GEN),
        "gamma2": G2_GEN,
        "delta2": g2_mul(delta, G2_GEN),
        "ic": ic,
    }

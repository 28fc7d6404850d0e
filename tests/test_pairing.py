"""BN254 optimal-ate pairing + native Groth16 verification
(replaces the reference CI's snarkjs acceptance step natively)."""

from merlin_zkevm_prover_tpu.snark import pairing as pr

R = pr.R


def test_bilinearity():
    e1 = pr.pairing(pr.G2_GEN, pr.G1_GEN)
    assert e1 != pr.F12_ONE
    assert pr.pairing(pr.g2_mul(2, pr.G2_GEN), pr.g1_mul(3, pr.G1_GEN)) == \
        pr.f12_pow(e1, 6)
    assert pr.f12_pow(e1, R) == pr.F12_ONE  # order-r target group


def test_groth16_verify_native():
    """Full pairing-based verification of a proof constructed from the
    toxic scalars of a tiny R1CS (x*y = z public)."""
    from merlin_zkevm_prover_tpu.snark.setup import R1CS, setup, \
        _lagrange_evals_at
    from merlin_zkevm_prover_tpu.snark import groth16

    a = [{2: 1}, {4: 1}]
    b = [{3: 1}, {0: 1}]
    c = [{4: 1}, {1: 1}]
    r1cs = R1CS(n_vars=5, n_public=1, a=a, b=b, c=c)
    key, toxic = setup(r1cs, seed=7)
    x, y = 3, 5
    witness = [1, x * y, x, y, x * y]

    u, v, w = toxic["u"], toxic["v"], toxic["w"]
    alpha, beta, delta, tau = (toxic["alpha"], toxic["beta"],
                               toxic["delta"], toxic["tau"])
    r_b, s_b = 11, 13
    mod = R
    a_scal = (alpha + sum(wi * ui for wi, ui in zip(witness, u)) +
              r_b * delta) % mod
    b_scal = (beta + sum(wi * vi for wi, vi in zip(witness, v)) +
              s_b * delta) % mod
    n = 1 << key.domain_bits
    lag = _lagrange_evals_at(tau, n, mod)
    pol_a, pol_b = groth16.build_abc(key, witness)
    a_tau = sum(pol_a[cc] * lag[cc] for cc in range(n)) % mod
    b_tau = sum(pol_b[cc] * lag[cc] for cc in range(n)) % mod
    c_tau = sum(pol_a[cc] * pol_b[cc] % mod * lag[cc]
                for cc in range(n)) % mod
    hz = (a_tau * b_tau - c_tau) % mod
    dinv = pow(delta, -1, mod)
    c_priv = sum(witness[i] * ((beta * u[i] + alpha * v[i] + w[i]) % mod)
                 for i in range(key.n_public + 1, key.n_vars)) % mod
    c_scal = ((c_priv + hz) * dinv + s_b * a_scal + r_b * b_scal -
              r_b * s_b * delta) % mod

    pi_a = pr.g1_mul(a_scal, pr.G1_GEN)
    pi_b = pr.g2_mul(b_scal, pr.G2_GEN)
    pi_c = pr.g1_mul(c_scal, pr.G1_GEN)
    proof = {
        "pi_a": list(pi_a),
        "pi_b": [list(pi_b[0]), list(pi_b[1])],
        "pi_c": list(pi_c),
        "publics": [x * y],
    }
    vk = pr.make_vk(toxic, r1cs.n_public)
    assert pr.groth16_verify(vk, proof)
    # tampered public fails
    bad = dict(proof)
    bad["publics"] = [x * y + 1]
    assert not pr.groth16_verify(vk, bad)

"""Native fflonk prove+verify (reference fflonk_prover.c.hpp; the CI
acceptance path verifies a fflonk final proof)."""

import pytest

from merlin_zkevm_prover_tpu.snark.fflonk import (
    FR,
    PlonkCS,
    fflonk_prove,
    fflonk_setup,
    fflonk_verify,
)


def _mul_circuit(pub_product: int, x: int, y: int):
    """n=8 PLONK circuit: row0 exposes the public product (qL=1 + PI),
    row1 enforces a*b - c = 0, and sigma wires c1 to a0."""
    n = 8
    qL = [0] * n
    qR = [0] * n
    qM = [0] * n
    qO = [0] * n
    qC = [0] * n
    qL[0] = 1
    qM[1] = 1
    qO[1] = (-1) % FR
    sigma = list(range(3 * n))
    sigma[0], sigma[2 * n + 1] = sigma[2 * n + 1], sigma[0]  # a0 <-> c1
    cs = PlonkCS(n=n, qL=qL, qR=qR, qM=qM, qO=qO, qC=qC, sigma=sigma,
                 n_public=1)
    a = [pub_product, x] + [0] * (n - 2)
    b = [0, y] + [0] * (n - 2)
    c = [0, pub_product] + [0] * (n - 2)
    return cs, a, b, c


@pytest.fixture(scope="module")
def proven():
    cs, a, b, c = _mul_circuit(15, 3, 5)
    key = fflonk_setup(cs, seed=7)
    proof = fflonk_prove(key, a, b, c, rand=b"\x01" * 32)
    return key, proof


def test_fflonk_prove_verify(proven):
    key, proof = proven
    assert proof["publics"] == [15]
    assert fflonk_verify(key, proof)


def test_fflonk_tampered_eval_rejected(proven):
    key, proof = proven
    bad = dict(proof)
    bad["evals"] = dict(proof["evals"])
    bad["evals"]["a"] = (proof["evals"]["a"] + 1) % FR
    assert not fflonk_verify(key, bad)


def test_fflonk_wrong_public_rejected(proven):
    key, proof = proven
    bad = dict(proof)
    bad["publics"] = [16]
    assert not fflonk_verify(key, bad)


def test_fflonk_unsatisfied_circuit_raises():
    cs, a, b, c = _mul_circuit(15, 3, 4)  # 3*4 != 15
    key = fflonk_setup(cs, seed=7)
    with pytest.raises(ValueError):
        fflonk_prove(key, a, b, c, rand=b"\x02" * 32)


def test_r1cs_to_plonk_fflonk_roundtrip():
    """R1CS -> PLONK conversion -> fflonk prove/verify (the native
    final-stage fflonk path, reference prover.cpp:887 zkey-ID selection)."""
    from merlin_zkevm_prover_tpu.snark.r1cs_to_plonk import r1cs_to_plonk
    from merlin_zkevm_prover_tpu.snark.setup import R1CS

    # publics: z, w.  constraints: x*y = z; (x+y)*(x+2y+5) = w
    x, y = 6, 11
    z = x * y
    w = (x + y) * (x + 2 * y + 5)
    witness = [1, z, w, x, y]
    r1cs = R1CS(
        n_vars=5, n_public=2,
        a=[{3: 1}, {3: 1, 4: 1}],
        b=[{4: 1}, {3: 1, 4: 2, 0: 5}],
        c=[{1: 1}, {2: 1}],
    )
    from merlin_zkevm_prover_tpu.snark.fflonk import (
        fflonk_prove,
        fflonk_setup,
        fflonk_verify,
    )

    cs, av, bv, cv = r1cs_to_plonk(r1cs, witness)
    key = fflonk_setup(cs, seed=11)
    proof = fflonk_prove(key, av, bv, cv, rand=b"\x03" * 32)
    assert proof["publics"] == [z, w]
    assert fflonk_verify(key, proof)

    # a wrong witness must fail the prover's own divisibility checks
    bad_wit = [1, z + 1, w, x, y]
    cs2, av2, bv2, cv2 = r1cs_to_plonk(r1cs, bad_wit)
    key2 = fflonk_setup(cs2, seed=11)
    with pytest.raises(ValueError):
        fflonk_prove(key2, av2, bv2, cv2, rand=b"\x04" * 32)

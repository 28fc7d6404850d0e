"""zkey/wtns binfile roundtrip: dev setup -> zkey bytes -> key -> prove."""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.ops.bn254_field import FR
from merlin_zkevm_prover_tpu.snark import groth16
from merlin_zkevm_prover_tpu.snark.binfile import (
    load_wtns,
    load_zkey,
    write_wtns,
    write_zkey,
)
from merlin_zkevm_prover_tpu.snark.setup import setup

R = FR.mod


def make_r1cs():
    from merlin_zkevm_prover_tpu.snark.setup import R1CS

    a = [{2: 1}, {4: 1}]
    b = [{3: 1}, {0: 1}]
    c = [{4: 1}, {1: 1}]
    return R1CS(n_vars=5, n_public=1, a=a, b=b, c=c)


def test_wtns_roundtrip():
    wit = [1, 15, 3, 5, 15]
    data = write_wtns(wit)
    assert load_wtns(data) == wit


@pytest.mark.slow
def test_zkey_roundtrip_and_prove():
    key, toxic = setup(make_r1cs(), seed=7)
    zk = groth16.key_to_zkey(key)
    blob = write_zkey(zk)
    zk2 = load_zkey(blob)
    assert zk2.n_vars == 5 and zk2.n_public == 1
    assert zk2.points_a == zk.points_a
    assert zk2.points_b2 == zk.points_b2
    assert zk2.coefs == zk.coefs
    key2 = groth16.key_from_zkey(zk2)

    witness = [1, 15, 3, 5, 15]
    p1 = groth16.prove(key, witness, r=3, s=4)
    p2 = groth16.prove(key2, witness, r=3, s=4)
    assert p1["pi_a"] == p2["pi_a"]
    assert p1["pi_b"] == p2["pi_b"]
    assert p1["pi_c"] == p2["pi_c"]

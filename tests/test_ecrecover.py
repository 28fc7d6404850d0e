"""secp256k1 + ECRecover (reference src/ecrecover/ecrecover.cpp)."""

from merlin_zkevm_prover_tpu.executor.ecrecover import (
    ECR_NO_ERROR,
    ECR_R_IS_ZERO,
    ECR_S_IS_TOO_BIG,
    ecrecover,
    sign_for_test,
)
from merlin_zkevm_prover_tpu.ops import secp256k1 as ec
from merlin_zkevm_prover_tpu.utils.keccak import keccak256


def test_curve_basics():
    g = (ec.GX, ec.GY)
    assert ec.is_on_curve(g)
    g2 = ec.dbl(g)
    assert ec.is_on_curve(g2)
    # known 2G from the secp256k1 spec
    assert g2[0] == int(
        "C6047F9441ED7D6D3045406E95C07CD85C778E4B8CEF3CA7ABAC09B95C709EE5",
        16,
    )
    assert ec.add(g, g2) == ec.mul(3, g)
    # group order: n*G = infinity
    assert ec.mul(ec.N, g) is None
    # Shamir double-scalar equals separate multiplication
    assert ec.mul2(5, g, 7, g2) == ec.add(ec.mul(5, g), ec.mul(7, g2))


def test_ecrecover_roundtrip():
    priv = 0xA1B2C3D4E5F60718293A4B5C6D7E8F9011223344556677889900AABBCCDDEEFF
    pub = ec.mul(priv, (ec.GX, ec.GY))
    addr = int.from_bytes(
        keccak256(pub[0].to_bytes(32, "big") + pub[1].to_bytes(32, "big"))[12:],
        "big",
    )
    digest = int.from_bytes(keccak256(b"zkevm batch"), "big") % ec.N
    r, s, v = sign_for_test(digest, priv, k=0x1234567)
    got, err = ecrecover(digest, r, s, v)
    assert err == ECR_NO_ERROR
    assert got == addr


def test_ecrecover_error_paths():
    digest = 123456789
    assert ecrecover(digest, 0, 5, 27)[1] == ECR_R_IS_ZERO
    # EIP-2 high-s rejected in tx mode, accepted in precompile mode
    priv, k = 999331, 777789
    r, s, v = sign_for_test(digest, priv, k)
    high_s = ec.N - s
    flip_v = 27 + (1 - (v - 27))
    assert ecrecover(digest, r, high_s, flip_v)[1] == ECR_S_IS_TOO_BIG
    got, err = ecrecover(digest, r, high_s, flip_v, precompiled=True)
    assert err == ECR_NO_ERROR
    pub = ec.mul(priv, (ec.GX, ec.GY))
    addr = int.from_bytes(
        keccak256(pub[0].to_bytes(32, "big") + pub[1].to_bytes(32, "big"))[12:],
        "big",
    )
    assert got == addr

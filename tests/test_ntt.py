"""NTT / INTT / extendPol bit-exactness tests vs a pure-python oracle."""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.ops import goldilocks as gl
from merlin_zkevm_prover_tpu.ops import ntt as nttmod

P = gl.P


def oracle_ntt(vals, root):
    """Recursive python-int Cooley-Tukey, natural in/out."""
    n = len(vals)
    if n == 1:
        return list(vals)
    even = oracle_ntt(vals[0::2], root * root % P)
    odd = oracle_ntt(vals[1::2], root * root % P)
    out = [0] * n
    w = 1
    for k in range(n // 2):
        t = w * odd[k] % P
        out[k] = (even[k] + t) % P
        out[k + n // 2] = (even[k] - t) % P
        w = w * root % P
    return out


def oracle_intt(vals, nbits):
    root_inv = pow(gl.w(nbits), P - 2, P)
    out = oracle_ntt(vals, root_inv)
    ninv = pow(len(vals), P - 2, P)
    return [v * ninv % P for v in out]


def rand_u64(rng, shape):
    return rng.integers(0, P, size=shape, dtype=np.uint64)


@pytest.mark.parametrize("nbits", [0, 1, 2, 5, 8])
def test_ntt_matches_oracle(nbits):
    rng = np.random.default_rng(nbits)
    n = 1 << nbits
    a = rand_u64(rng, (n,))
    got = gl.to_u64(nttmod.ntt(gl.from_u64(a)))
    want = oracle_ntt([int(v) for v in a], gl.w(nbits))
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))


@pytest.mark.parametrize("nbits", [1, 4, 7])
def test_intt_roundtrip(nbits):
    rng = np.random.default_rng(100 + nbits)
    n = 1 << nbits
    a = rand_u64(rng, (n, 3))
    back = gl.to_u64(nttmod.intt(nttmod.ntt(gl.from_u64(a))))
    np.testing.assert_array_equal(back, a)


def test_intt_matches_oracle():
    nbits = 6
    rng = np.random.default_rng(7)
    n = 1 << nbits
    a = rand_u64(rng, (n,))
    got = gl.to_u64(nttmod.intt(gl.from_u64(a)))
    want = oracle_intt([int(v) for v in a], nbits)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))


def test_ntt_multicolumn_matches_per_column():
    nbits = 5
    rng = np.random.default_rng(9)
    n = 1 << nbits
    a = rand_u64(rng, (n, 4))
    got = gl.to_u64(nttmod.ntt(gl.from_u64(a)))
    for c in range(4):
        want = oracle_ntt([int(v) for v in a[:, c]], gl.w(nbits))
        np.testing.assert_array_equal(got[:, c], np.array(want, dtype=np.uint64))


def test_extend_pol_agrees_with_pointwise_eval():
    """LDE output k equals P(shift * w_ext^k) for the interpolated poly."""
    n_bits, n_bits_ext = 3, 5
    n, next_ = 1 << n_bits, 1 << n_bits_ext
    rng = np.random.default_rng(21)
    a = rand_u64(rng, (n, 2))
    ext = gl.to_u64(nttmod.extend_pol(gl.from_u64(a), n_bits, n_bits_ext))
    assert ext.shape == (next_, 2)

    for c in range(2):
        coeffs = oracle_intt([int(v) for v in a[:, c]], n_bits)
        w_ext = gl.w(n_bits_ext)
        x = gl.SHIFT
        for k in range(next_):
            val = 0
            for d in reversed(range(n)):
                val = (val * x + coeffs[d]) % P
            assert ext[k, c] == val, (c, k)
            x = x * w_ext % P


def test_extend_pol_prefix_consistency():
    """Rows of the LDE at stride blowup with shift-cancel reproduce P on the
    original domain only through coefficients -- sanity on shapes + 1D path."""
    n_bits, n_bits_ext = 4, 6
    rng = np.random.default_rng(3)
    a = rand_u64(rng, (1 << n_bits,))
    out = nttmod.extend_pol(gl.from_u64(a), n_bits, n_bits_ext)
    assert out.shape == (1 << n_bits_ext,)


def test_eval_pol_coeffs():
    rng = np.random.default_rng(4)
    coeffs = rand_u64(rng, (8, 1))
    x = int(rand_u64(rng, ()))
    got = gl.to_u64(nttmod.eval_pol_coeffs(gl.from_u64(coeffs), gl.const(x)))
    want = 0
    for d in reversed(range(8)):
        want = (want * x + int(coeffs[d, 0])) % P
    assert got[0] == want

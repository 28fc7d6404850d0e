import numpy as np
import pytest

from merlin_zkevm_prover_tpu.ops import goldilocks as gl
from merlin_zkevm_prover_tpu.ops import goldilocks3 as gl3
from field_oracle import P, gl3_mul, gl3_inv

rng = np.random.default_rng(12345)


def rand_u64(n):
    """Random canonical field elements, biased to include edge cases."""
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    edge = np.array(
        [0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32, (1 << 32) + 1, (1 << 63)],
        dtype=np.uint64,
    )
    k = min(len(edge), n)
    vals[:k] = edge[:k]
    return vals


def test_roundtrip():
    a = rand_u64(64)
    assert np.array_equal(gl.to_u64(gl.from_u64(a)), a)


@pytest.mark.parametrize("op,fn", [("add", gl.add), ("sub", gl.sub), ("mul", gl.mul)])
def test_binary_ops(op, fn):
    n = 256
    a = rand_u64(n)
    b = rand_u64(n)[::-1].copy()
    got = gl.to_u64(fn(gl.from_u64(a), gl.from_u64(b)))
    ref = {
        "add": lambda x, y: (int(x) + int(y)) % P,
        "sub": lambda x, y: (int(x) - int(y)) % P,
        "mul": lambda x, y: (int(x) * int(y)) % P,
    }[op]
    want = np.array([ref(x, y) for x, y in zip(a, b)], dtype=np.uint64)
    assert np.array_equal(got, want), f"{op} mismatch"


def test_mul_exhaustive_edges():
    edges = [0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32, (1 << 32) + 1,
             (1 << 48), P - (1 << 32), 7, 49, gl.w(32), gl.w(24)]
    a = np.array([x for x in edges for _ in edges], dtype=np.uint64)
    b = np.array([y for _ in edges for y in edges], dtype=np.uint64)
    got = gl.to_u64(gl.mul(gl.from_u64(a), gl.from_u64(b)))
    want = np.array([(int(x) * int(y)) % P for x, y in zip(a, b)], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_neg_pow7_small():
    a = rand_u64(128)
    x = gl.from_u64(a)
    assert np.array_equal(gl.to_u64(gl.neg(x)), np.array([(P - int(v)) % P for v in a], dtype=np.uint64))
    assert np.array_equal(
        gl.to_u64(gl.pow7(x)),
        np.array([pow(int(v), 7, P) for v in a], dtype=np.uint64),
    )
    for c in [0, 1, 8, 17, 41, 49, 0xFFFFFFFF]:
        assert np.array_equal(
            gl.to_u64(gl.mul_small(x, c)),
            np.array([(int(v) * c) % P for v in a], dtype=np.uint64),
        ), f"mul_small {c}"


def test_inv_and_batch_inverse():
    a = rand_u64(64)
    a[0] = 5  # avoid 0 in position 0 for the plain-inverse check below
    x = gl.from_u64(a)
    got = gl.to_u64(gl.inv(x))
    want = np.array([pow(int(v), P - 2, P) for v in a], dtype=np.uint64)
    assert np.array_equal(got, want)

    b = rand_u64(64)
    b[3] = 0  # batch inverse must pass zeros through
    got = gl.to_u64(gl.batch_inverse(gl.from_u64(b), axis=0))
    want = np.array([pow(int(v), P - 2, P) if v else 0 for v in b], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_roots_of_unity():
    for k in [0, 1, 2, 3, 10, 23, 24, 32]:
        w = gl.w(k)
        assert pow(w, 1 << k, P) == 1
        if k > 0:
            assert pow(w, 1 << (k - 1), P) == P - 1
        assert gl.w(k) == pow(gl.w(32), 1 << (32 - k), P)
    assert (gl.SHIFT * gl.SHIFT_INV) % P == 1


def test_powers():
    w = gl.w(10)
    got = gl.to_u64(gl.powers(w, 16, start=gl.SHIFT))
    want = np.array([(gl.SHIFT * pow(w, i, P)) % P for i in range(16)], dtype=np.uint64)
    assert np.array_equal(got, want)


# ------------------------- GF(p^3) -------------------------


def rand3(n):
    return np.stack([rand_u64(n), rand_u64(n)[::-1].copy(), rand_u64(n)[::2].repeat(2)[:n]], axis=-1)


def test_gl3_mul():
    n = 64
    a = rand3(n)
    b = rand3(n)[::-1].copy()
    got = gl3.to_u64(gl3.mul(gl3.from_u64(a), gl3.from_u64(b)))
    for i in range(n):
        want = gl3_mul(tuple(int(v) for v in a[i]), tuple(int(v) for v in b[i]))
        assert tuple(int(v) for v in got[i]) == want, i


def test_gl3_inv():
    a = np.array([[3, 7, 11], [1, 0, 0], [gl.w(20), 5, P - 3]], dtype=np.uint64)
    x = gl3.from_u64(a)
    got = gl3.to_u64(gl3.inv(x))
    for i in range(len(a)):
        ai = tuple(int(v) for v in a[i])
        gi = tuple(int(v) for v in got[i])
        assert gl3_mul(ai, gi) == (1, 0, 0), i


def test_gl3_batch_inverse():
    n = 16
    a = rand3(n)
    a[5] = 0
    x = gl3.from_u64(a)
    got = gl3.to_u64(gl3.batch_inverse(x, axis=0))
    for i in range(n):
        ai = tuple(int(v) for v in a[i])
        gi = tuple(int(v) for v in got[i])
        if ai == (0, 0, 0):
            assert gi == (0, 0, 0)
        else:
            assert gl3_mul(ai, gi) == (1, 0, 0), i

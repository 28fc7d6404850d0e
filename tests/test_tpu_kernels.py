"""Pallas kernel semantics (interpret mode) + sharded four-step NTT.

The Mosaic-compiled kernels run only on real TPUs; here the same kernel
code runs under the Pallas interpreter at tiny sizes and must be bit-exact
with the jnp reference path (which tests/test_poseidon.py and
tests/test_ntt.py pin against python-int oracles).
"""

import numpy as np
import pytest

import jax

from merlin_zkevm_prover_tpu.ops import goldilocks as gl
from merlin_zkevm_prover_tpu.ops import ntt as nttmod
from merlin_zkevm_prover_tpu.ops import poseidon_gl

rng = np.random.default_rng(7)


def rand_gl(shape):
    return gl.from_u64(rng.integers(0, gl.P, shape, dtype=np.uint64))


@pytest.fixture
def tiny_tiles(monkeypatch):
    """Shrink the Poseidon kernel batch tile so the Pallas interpreter
    runs the tests in seconds (the production tile pads to 2048 lanes)."""
    from merlin_zkevm_prover_tpu.ops import poseidon_tpu as pt

    monkeypatch.setattr(pt, "R_SUB", 1)
    monkeypatch.setattr(pt, "BLOCK_B", 128)
    pt._permute_call.cache_clear()
    pt._linear_hash_call.cache_clear()
    pt._node_hash_call.cache_clear()
    yield pt
    pt._permute_call.cache_clear()
    pt._linear_hash_call.cache_clear()
    pt._node_hash_call.cache_clear()


def test_poseidon_tpu_kernels_interpret(tiny_tiles):
    pt = tiny_tiles
    if not pt.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    st = rand_gl((12, 16))
    got = gl.to_u64(pt.permute_tpu(st, interpret=True))
    want = gl.to_u64(poseidon_gl.permute(st))
    assert np.array_equal(got, want)

    rows = rand_gl((10, 21))
    got = gl.to_u64(pt.linear_hash_tpu(rows, interpret=True))
    want = gl.to_u64(poseidon_gl.linear_hash(rows))
    assert np.array_equal(got, want)


def test_ntt_tpu_kernels_interpret():
    from merlin_zkevm_prover_tpu.ops import ntt_tpu as nt

    if not nt.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    for nbits, cols in [(4, 3), (10, 1)]:
        a = rand_gl((1 << nbits, cols))
        assert np.array_equal(
            gl.to_u64(nt.ntt_tpu(a, interpret=True)),
            gl.to_u64(nttmod.ntt(a)),
        )
        assert np.array_equal(
            gl.to_u64(nt.extend_pol_tpu(a, nbits, nbits + 1, interpret=True)),
            gl.to_u64(nttmod.extend_pol(a, nbits, nbits + 1)),
        )


def test_ntt4step_sharded_bitexact():
    from merlin_zkevm_prover_tpu.parallel import ntt4step as n4
    from merlin_zkevm_prover_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, rows=8, cols=1)
    a = rand_gl((1 << 8, 2))
    with mesh:
        got = gl.to_u64(n4.ntt4step(a, mesh))
        goti = gl.to_u64(n4.ntt4step(a, mesh, inverse=True))
    assert np.array_equal(got, gl.to_u64(nttmod.ntt(a)))
    assert np.array_equal(goti, gl.to_u64(nttmod.intt(a)))


def test_ntt4step_under_jit():
    from merlin_zkevm_prover_tpu.parallel import ntt4step as n4
    from merlin_zkevm_prover_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, rows=8, cols=1)
    a = rand_gl((1 << 9, 4))
    with mesh:
        f = jax.jit(lambda x: n4.extend_pol_4step(x, 9, 10, mesh))
        got = gl.to_u64(f(a))
    assert np.array_equal(got, gl.to_u64(nttmod.extend_pol(a, 9, 10)))

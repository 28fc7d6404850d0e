"""Native zkio kernels vs python references (and graceful fallback)."""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu import native
from merlin_zkevm_prover_tpu.ops import poseidon_gl
from merlin_zkevm_prover_tpu.utils.keccak import keccak_f


def test_limb_marshaling_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 63, 1000, dtype=np.uint64) * 2 + 1
    lo, hi = native.u64_to_u32pair(x)
    back = native.u32pair_to_u64(lo, hi)
    np.testing.assert_array_equal(back, x)


def test_native_poseidon_matches_python():
    state = list(range(12))
    assert native.poseidon_permute(state) == poseidon_gl.permute_host(state)
    rng = np.random.default_rng(1)
    batch = rng.integers(0, poseidon_gl.P, (8, 12), dtype=np.uint64)
    out = native.poseidon_permute_batch(batch)
    for i in range(8):
        want = poseidon_gl.permute_host([int(v) for v in batch[i]])
        assert [int(v) for v in out[i]] == want


def test_native_keccak_matches_python():
    state = list(range(25))
    assert native.keccak_f1600(state) == keccak_f(list(state))


def test_pols_file_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    data = rng.integers(0, 1 << 62, (64, 7), dtype=np.uint64)
    path = str(tmp_path / "test.commit")
    native.write_pols(path, data)
    back = native.read_pols(path, shape=(64, 7))
    np.testing.assert_array_equal(back, data)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_lib_actually_loaded():
    assert native.available()

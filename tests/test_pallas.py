"""Pallas Poseidon kernel semantics (interpreter mode on the CPU mesh)."""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.ops import goldilocks as gl
from merlin_zkevm_prover_tpu.ops import poseidon_gl as pgl
from merlin_zkevm_prover_tpu.ops import poseidon_tpu as pt


@pytest.mark.skipif(not pt.HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_kernel_matches_host_interpret():
    rng = np.random.default_rng(0)
    B = 16
    vals = rng.integers(0, gl.P, (12, B), dtype=np.uint64)
    out = pt.permute_tpu(gl.from_u64(vals), interpret=True)
    got = gl.to_u64(out)
    for b in (0, 7, B - 1):
        want = pgl.permute_host([int(v) for v in vals[:, b]])
        assert [int(v) for v in got[:, b]] == want

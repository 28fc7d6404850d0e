"""NTT kernel edge-value regression (interpret mode).

The Pallas NTT kernels inherit a field mul with deferred
canonicalization (residues in [0, 2^64)); their add/sub carry chains
are exact only for canonical operands.  Random-data bit-exactness
tests hit the [p, 2^64) window with probability ~2^-32 per op and
never saw the resulting dropped epsilon carry — structured inputs
(one-hot columns, the zkEVM's sparse trace) hit it constantly and the
2^18 flagship proof failed its own verifier on it.  These closed-form
probes (impulse / constant / one-hot Lagrange) run the kernel logic in
interpret mode so the exact TPU dataflow is pinned on CPU."""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.ops import goldilocks as gl
from merlin_zkevm_prover_tpu.ops.goldilocks import P, SHIFT, w as glw
from merlin_zkevm_prover_tpu.ops import ntt_tpu as nt

pytestmark = pytest.mark.skipif(not nt.HAVE_PALLAS,
                                reason="pallas unavailable")

NB = 9  # multi-stage radix-4 in one VMEM kernel (interpret is slow)


def test_intt_one_hot_all_equal_interpret():
    n = 1 << NB
    col = np.zeros((n, 1), dtype=np.uint64)
    col[0, 0] = 1
    out = gl.to_u64(nt.intt_tpu(gl.from_u64(col), interpret=True))[:, 0]
    inv_n = pow(n, P - 2, P)
    assert np.all(out == np.uint64(inv_n)), \
        f"{int((out != np.uint64(inv_n)).sum())} rows wrong"


def test_ntt_impulse_constant_interpret():
    n = 1 << NB
    c = np.zeros((n, 1), dtype=np.uint64)
    c[0, 0] = 7
    out = gl.to_u64(nt.ntt_tpu(gl.from_u64(c), interpret=True))[:, 0]
    assert np.all(out == np.uint64(7))


def test_extend_pol_one_hot_lagrange_interpret():
    n = 1 << NB
    col = np.zeros((n, 2), dtype=np.uint64)
    col[0, :] = 1

    def L0_at(x):
        num = (pow(x, n, P) - 1) % P
        den = (n * (x - 1)) % P
        return num * pow(den, P - 2, P) % P

    lde = gl.to_u64(nt.extend_pol_tpu(gl.from_u64(col), NB, NB + 1,
                                      interpret=True))[:, 0]
    w_ext = glw(NB + 1)
    for j in (0, 1, 3, 191, 192, 193, (1 << (NB + 1)) - 1):
        assert int(lde[j]) == L0_at(SHIFT * pow(w_ext, j, P) % P), \
            f"row {j} wrong"

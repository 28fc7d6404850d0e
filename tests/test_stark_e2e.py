"""End-to-end STARK prove+verify on a small AIR exercising every argument
type: transition constraints, publics, a plookup, a permutation argument,
and a connection (copy-constraint) argument."""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.ops.goldilocks import P
from merlin_zkevm_prover_tpu.stark import (
    AIR,
    StarkProver,
    StarkProof,
    VerifyError,
    compile_air,
    verify,
)

N_BITS = 5
N = 1 << N_BITS


def build_air_and_trace():
    air = AIR("testcirc", N_BITS)
    a = air.committed("a")
    b = air.committed("b")
    v = air.committed("v")       # range-checked column
    p1 = air.committed("p1")     # permutation of p2
    p2 = air.committed("p2")
    w0 = air.committed("w0")     # copy-constrained to w1
    w1 = air.committed("w1")

    islast = np.zeros(N, dtype=np.uint64)
    islast[N - 1] = 1
    c_islast = air.constant("ISLAST", islast)
    table = air.constant("TABLE", np.arange(N, dtype=np.uint64))

    # fibonacci transition (disabled on last row because of wrap-around)
    air.constraint((1 - c_islast) * (a.next() - b))
    air.constraint((1 - c_islast) * (b.next() - (a + b)))

    air.public("a0", a, 0)
    air.public("b0", b, 0)
    air.public("alast", a, N - 1)

    # range check: v values must appear in TABLE
    air.lookup([v], [table])
    # permutation: p1 rows are a permutation of p2 rows
    air.permutation([p1], [p2])
    # connection: w0[i] must equal w1[i] (sigma swaps the two columns)
    x_n = np.empty(N, dtype=object)
    cur = 1
    from merlin_zkevm_prover_tpu.ops.goldilocks import w as gl_w

    wn = gl_w(N_BITS)
    xs = []
    for i in range(N):
        xs.append(cur)
        cur = cur * wn % P
    k1 = 7
    s0 = air.constant("S0", np.array([(k1 * x) % P for x in xs], dtype=np.uint64))
    s1 = air.constant("S1", np.array(xs, dtype=np.uint64))
    air.connection([w0, w1], [s0, s1])

    # trace
    rng = np.random.default_rng(42)
    trace = np.zeros((N, 7), dtype=np.uint64)
    trace[0, 0] = 1  # a
    trace[0, 1] = 1  # b
    for i in range(1, N):
        trace[i, 0] = trace[i - 1, 1]
        trace[i, 1] = (int(trace[i - 1, 0]) + int(trace[i - 1, 1])) % P
    trace[:, 2] = rng.integers(0, N, N)                    # v in range
    perm = rng.permutation(N)
    trace[:, 4] = rng.integers(0, P, N, dtype=np.uint64)   # p2 random
    trace[:, 3] = trace[perm, 4]                           # p1 = shuffled p2
    trace[:, 5] = rng.integers(0, P, N, dtype=np.uint64)   # w0
    trace[:, 6] = trace[:, 5]                              # w1 = w0
    return air, trace


@pytest.fixture(scope="module")
def proven():
    air, trace = build_air_and_trace()
    info = compile_air(air, n_queries=6, final_bits=3, fri_fold_bits=2)
    const_vals = np.stack(air.const_values, axis=1) if air.const_values else \
        np.zeros((N, 0), dtype=np.uint64)
    prover = StarkProver(info, const_vals)
    proof = prover.prove(trace)
    return info, prover, proof


def test_prove_and_verify(proven):
    info, prover, proof = proven
    assert verify(info, prover.const_tree.root(), proof)


def test_proof_json_roundtrip(proven):
    info, prover, proof = proven
    s = proof.to_json()
    proof2 = StarkProof.from_json(s)
    assert verify(info, prover.const_tree.root(), proof2)


def test_tampered_public_rejected(proven):
    info, prover, proof = proven
    s = proof.to_json()
    bad = StarkProof.from_json(s)
    bad.publics[0] = (bad.publics[0] + 1) % P
    with pytest.raises(VerifyError):
        verify(info, prover.const_tree.root(), bad)


def test_tampered_eval_rejected(proven):
    info, prover, proof = proven
    bad = StarkProof.from_json(proof.to_json())
    bad.evals[0][0] = (bad.evals[0][0] + 1) % P
    with pytest.raises(VerifyError):
        verify(info, prover.const_tree.root(), bad)


def test_tampered_query_value_rejected(proven):
    info, prover, proof = proven
    bad = StarkProof.from_json(proof.to_json())
    bad.queries_step0[0]["cm1"].values[0] = (
        bad.queries_step0[0]["cm1"].values[0] + 1
    ) % P
    with pytest.raises(VerifyError):
        verify(info, prover.const_tree.root(), bad)


def test_invalid_witness_rejected():
    """A trace violating the fibonacci transition cannot produce a valid
    proof: the quotient is not a polynomial, so some query check fails."""
    air, trace = build_air_and_trace()
    trace = trace.copy()
    trace[3, 0] = (int(trace[3, 0]) + 1) % P  # break a' = b at row 2
    info = compile_air(air, n_queries=6, final_bits=3, fri_fold_bits=2)
    const_vals = np.stack(air.const_values, axis=1)
    prover = StarkProver(info, const_vals)
    proof = prover.prove(trace)
    with pytest.raises(VerifyError):
        verify(info, prover.const_tree.root(), proof)

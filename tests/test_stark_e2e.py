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

from merlin_zkevm_prover_tpu.models.smoke import build_smoke_air

N_BITS = 5
N = 1 << N_BITS


def build_air_and_trace():
    return build_smoke_air(n_bits=N_BITS, seed=42)


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


def test_self_only_lookup_proves():
    """A plookup with selF but no selT and a dim-1 t (the zkEVM main.pil
    memory/hashP read shape): pil-stark wraps f as selF*(f - t) + t, so
    unselected rows take the current row's t value (always present) —
    the defVal challenge there would make the lookup unsatisfiable and
    crash h1/h2 assembly with a dim mismatch (regression, r3)."""
    n_bits, n = 4, 16
    air = AIR("selonly", n_bits)
    v = air.committed("v")
    sel = air.committed("sel")
    table = air.constant("TBL", np.arange(n, dtype=np.uint64))
    air.lookup([v], [table], f_sel=sel)
    air.constraint(sel * (sel - 1))

    rng = np.random.default_rng(7)
    trace = np.zeros((n, 2), dtype=np.uint64)
    selv = rng.integers(0, 2, n, dtype=np.uint64)
    vals = rng.integers(0, n, n, dtype=np.uint64)
    # unselected rows hold junk NOT in the table: only selected rows
    # must satisfy the lookup
    trace[:, 0] = np.where(selv == 1, vals, np.uint64(12345678))
    trace[:, 1] = selv

    info = compile_air(air, n_queries=4, final_bits=2, fri_fold_bits=2)
    const_vals = np.stack(air.const_values, axis=1)
    prover = StarkProver(info, const_vals)
    proof = prover.prove(trace)
    verify(info, prover.const_tree.root(), proof)

"""Recursion stages: plonk12c lowering + in-circuit STARK verifier.

Default suite: circuit-level checks (fast).  The full chain — inner STARK
-> recursive1 plonk proof -> recursive2 aggregation — runs under RUN_SLOW=1
(CPU proving of the 2^13-row outer STARKs takes ~15 min each).
"""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.models.smoke import (
    build_smoke_air,
    smoke_const_values,
)
from merlin_zkevm_prover_tpu.ops import poseidon_gl
from merlin_zkevm_prover_tpu.recursion.gates import Circuit
from merlin_zkevm_prover_tpu.recursion.plonk import circuit_to_air, plan_layout
from merlin_zkevm_prover_tpu.recursion.recursive import (
    RecursiveStage,
    build_verifier_circuit,
)
from merlin_zkevm_prover_tpu.stark import verifier
from merlin_zkevm_prover_tpu.stark.compiler import compile_air
from merlin_zkevm_prover_tpu.stark.prover import StarkProver

P = (1 << 64) - (1 << 32) + 1


def _inner():
    air, trace = build_smoke_air(n_bits=5)
    info = compile_air(air, n_queries=2, final_bits=4, fri_fold_bits=3)
    prover = StarkProver(info, smoke_const_values(air))
    proof = prover.prove(trace)
    return info, prover.const_tree.root(), proof, trace, prover


def test_plonk12c_roundtrip():
    """Poseidon-preimage circuit proves and verifies; tamper fails."""
    c = Circuit()
    pre = [c.witness(i + 5) for i in range(12)]
    out = c.poseidon(pre)
    for j in range(4):
        c.expose(out[j])
    assert [c.val(w) for w in out[:4]] == \
        poseidon_gl.permute_host([i + 5 for i in range(12)])[:4]

    air, trace, lay = circuit_to_air(c, "p12c_test")
    info = compile_air(air, n_queries=3, fri_fold_bits=2, final_bits=4)
    prover = StarkProver(info, smoke_const_values(air))
    proof = prover.prove(trace)
    assert verifier.verify(info, prover.const_tree.root(), proof)

    bad = prover.prove(trace)
    bad.publics[0] = (bad.publics[0] + 1) % P
    with pytest.raises(verifier.VerifyError):
        verifier.verify(info, prover.const_tree.root(), bad)


def test_verifier_circuit_witness():
    """The in-circuit verifier accepts a valid proof's witness and rejects
    a tampered one (witness-level, no outer proving — fast)."""
    info, croot, proof, _, _ = _inner()
    c = build_verifier_circuit([(info, croot, proof)])
    stats = c.stats()
    assert stats["poseidon_blocks"] > 20
    assert c.public_wires  # publics + const root exposed
    lay = plan_layout(c)
    assert lay.n >= stats["poseidon_blocks"] * 31

    # tampering any component must be caught while building the witness
    import copy

    bad = copy.deepcopy(proof)
    bad.evals[0][0] = (bad.evals[0][0] + 1) % P
    with pytest.raises(AssertionError):
        build_verifier_circuit([(info, croot, bad)])

    bad2 = copy.deepcopy(proof)
    bad2.queries_step0[0]["cm1"].values[0] = \
        (bad2.queries_step0[0]["cm1"].values[0] + 1) % P
    with pytest.raises(AssertionError):
        build_verifier_circuit([(info, croot, bad2)])

    bad3 = copy.deepcopy(proof)
    bad3.final_pol[0][0] = (bad3.final_pol[0][0] + 1) % P
    with pytest.raises(AssertionError):
        build_verifier_circuit([(info, croot, bad3)])


@pytest.mark.slow
def test_recursive1_and_2_chain():
    info, croot, proof, trace, iprover = _inner()
    stage1 = RecursiveStage("recursive1", n_queries=2, final_bits=4,
                            fri_fold_bits=3)
    p1a = stage1.prove([(info, croot, proof)])
    assert verifier.verify(stage1.info, stage1.const_root(), p1a)
    # second proof through the same stage (witness refill path)
    proof_b = iprover.prove(trace)
    p1b = stage1.prove([(info, croot, proof_b)])
    assert verifier.verify(stage1.info, stage1.const_root(), p1b)

    stage2 = RecursiveStage("recursive2", n_queries=2, final_bits=4,
                            fri_fold_bits=3)
    r1 = stage1.info, stage1.const_root()
    p2 = stage2.prove([(r1[0], r1[1], p1a), (r1[0], r1[1], p1b)])
    assert verifier.verify(stage2.info, stage2.const_root(), p2)
    # aggregated publics bind both children and the stage-1 circuit id
    want = (list(p1a.publics) + [int(v) for v in r1[1]] +
            list(p1b.publics) + [int(v) for v in r1[1]])
    assert p2.publics == want

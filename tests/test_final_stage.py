"""FinalStage (recursiveF -> Groth16) coverage on a tiny BN128-committed
circuit (ADVICE r2: backend full mode's last hop had zero CI-run tests).
Mirrors backend.gen_final_proof's final hop without the heavy verifier-
circuit build: StarkProverBN128 proof -> build_final_r1cs -> Groth16 ->
native pairing verify (reference prover.cpp:788-949 flow)."""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.models.smoke import (
    build_smoke_air,
    smoke_const_values,
)
from merlin_zkevm_prover_tpu.recursion.final import FinalStage
from merlin_zkevm_prover_tpu.stark import compile_air, verify
from merlin_zkevm_prover_tpu.stark.prover_bn128 import (
    MerkleTreeBN128GL,
    StarkProverBN128,
    TranscriptBN128Adapter,
)


def test_final_stage_groth16_on_tiny_circuit():
    air, trace = build_smoke_air(n_bits=3, seed=3)
    info = compile_air(air, n_queries=2, final_bits=2, fri_fold_bits=1)
    prover = StarkProverBN128(info, smoke_const_values(air))
    proof = prover.prove(trace)
    verify(info, prover.const_tree.root(), proof,
           tree_cls=MerkleTreeBN128GL,
           transcript_cls=TranscriptBN128Adapter)
    final = FinalStage(info, prover.const_tree.root()[0])
    g16 = final.prove(proof)            # asserts the pairing check inside
    assert g16["verified"]

    # a tampered proof point must be REJECTED (not crash the pairing)
    from merlin_zkevm_prover_tpu.snark.pairing import groth16_verify, make_vk

    vk = make_vk(final.toxic, len(g16["publics"]))
    bad = dict(g16)
    bad["pi_a"] = [int(g16["pi_a"][0]) + 1, int(g16["pi_a"][1])]
    assert groth16_verify(vk, bad) is False

"""The staged (bounded-compile) prover path.

XLA:TPU compile cost is super-linear in fusion-group/graph size, so the
production prover never hands the compiler a program-sized graph: step
programs evaluate in node-count-bounded chunks (with chained-im results
carried across chunk boundaries as pending values), the h1/h2 sort and
grand-product z kernels are single shared jits, and step5 runs as
weighted column sums (device_core.py staged section).  These tests force
tiny chunk bounds + the matrix step5 on small circuits and check the
proofs still verify — i.e. the staged decomposition is bit-exact against
the host-side verifier.
"""

import os

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.ops.goldilocks import P
from merlin_zkevm_prover_tpu.stark import AIR, StarkProver, compile_air, verify
from merlin_zkevm_prover_tpu.stark import device_core as core
from merlin_zkevm_prover_tpu.models.smoke import build_smoke_air


@pytest.fixture()
def tiny_chunks(monkeypatch):
    monkeypatch.setenv("MERLIN_STEP_MAX_NODES", "12")
    monkeypatch.setenv("MERLIN_STEP5_MATRIX_MIN", "0")


def _high_degree_air(n_bits=5):
    """Degree-8 product constraint -> the compiler's degree lowering
    materializes nested cm3 im pols whose defining expressions reference
    EARLIER ims; with a tiny chunk bound those land in different step3
    chunks and later chunks must consume pending values."""
    air = AIR("highdeg", n_bits)
    n = air.n
    rng = np.random.default_rng(7)
    cols = [air.committed(f"a{j}") for j in range(8)]
    prod = air.committed("prod")
    e = cols[0]
    for c in cols[1:]:
        e = e * c
    air.constraint(prod - e)
    vals = rng.integers(1, P, (n, 8), dtype=np.uint64)
    pv = np.ones(n, dtype=object)
    for j in range(8):
        pv = pv * vals[:, j].astype(object) % P
    trace = np.concatenate(
        [vals, pv.astype(np.uint64)[:, None]], axis=1)
    return air, trace


def test_high_degree_im_chain_staged_chunks(tiny_chunks):
    air, trace = _high_degree_air()
    info = compile_air(air, n_queries=4, final_bits=3, fri_fold_bits=2)
    const_vals = np.zeros((air.n, 0), dtype=np.uint64) if not \
        air.const_values else np.stack(air.const_values, axis=1)
    prover = StarkProver(info, const_vals)
    assert len(prover._step3_spans) > 1
    # lowered ims must actually flow between chunks as pending values
    assert any(prover._step3_needs[i] for i in range(len(prover._step3_needs)))
    proof = prover.prove(trace)
    verify(info, prover.const_tree.root(), proof)


def test_smoke_staged_matches_monolithic(tiny_chunks):
    """Tiny-chunk staged prove of the full smoke circuit (lookup +
    permutation + connection + publics) still verifies."""
    air, trace = build_smoke_air(n_bits=5, seed=42)
    info = compile_air(air, n_queries=6, final_bits=3, fri_fold_bits=2)
    const_vals = np.stack(air.const_values, axis=1)
    prover = StarkProver(info, const_vals)
    assert len(prover._step4_spans) > 1
    assert prover._step5_matrix
    proof = prover.prove(trace)
    verify(info, prover.const_tree.root(), proof)


def test_chunk_planner_bounds():
    air, _ = build_smoke_air(n_bits=5, seed=1)
    info = compile_air(air, n_queries=2)
    spans = core.plan_program_chunks(info.step3prev, 10)
    assert spans[0][0] == 0 and spans[-1][1] == len(info.step3prev)
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c
    needs = core.chunk_pending_inputs(info.step3prev, spans)
    assert len(needs) == len(spans)

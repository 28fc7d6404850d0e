"""The flagship statement: prove a production batch against the real
665-column zkEVM main.pil (reduced-domain honest instantiation).

Fast tests pin the ROM-constant scaling formulas and the degree-lowered
compilation shape; the full prove at 2^18 runs under RUN_SLOW=1 (it is
also the TPU demo driven by tools/prove_zkevm.py)."""

import json
import os

import pytest

PIL = "/root/reference/src/main_sm/fork_5/scripts/main.pil.json"
ROM = "/root/reference/src/main_sm/fork_5/scripts/rom.json"
VEC = "/root/reference/testvectors/batchProof/input_executor_0.json"

needs_ref = pytest.mark.skipif(
    not (os.path.exists(PIL) and os.path.exists(VEC)),
    reason="reference files not present")


@needs_ref
def test_rom_scaling_reproduces_shipped_constants():
    from merlin_zkevm_prover_tpu.executor.rom_scaling import scaled_constants

    shipped = {k: int(v["value"])
               for k, v in json.load(open(ROM))["constants"].items()
               if v["type"] == "CONST"}
    for name, value in scaled_constants(1 << 23).items():
        assert shipped[name] == value, (name, value, shipped[name])


@needs_ref
def test_zkevm_compiles_at_blowup2():
    """Degree lowering must bring the PIL to q_deg 2 / blowup 2x
    (pil-stark's own zkevm starkstruct shape)."""
    from merlin_zkevm_prover_tpu.models.zkevm import (
        build_zkevm_air,
        compile_zkevm,
    )

    air = build_zkevm_air(n_bits=18, reparam_jmpn=True)
    info = compile_zkevm(air, n_queries=32)
    assert info.n_bits_ext - info.n_bits == 1
    assert info.q_deg == 2
    assert info.n_cm[0] == 665


@needs_ref
@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="full 2^18 batch proof (RUN_SLOW=1)")
def test_prove_real_batch_at_2_18():
    from merlin_zkevm_prover_tpu.models.zkevm import prove_batch
    from merlin_zkevm_prover_tpu.stark.pil_conformance import zkevm_publics

    d = json.load(open(VEC))
    info, const_root, proof, publics = prove_batch(d, n_bits=18,
                                                   n_queries=32)
    # publics bound to the batch's roots (prover.cpp:461-526 role)
    expect = zkevm_publics(json.load(open(PIL)), d)
    for i, v in expect.items():
        assert int(publics[i]) == v

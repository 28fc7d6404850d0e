"""Poseidon-BN254, arity-16 Merkle tree, BN128 transcript, CLI, checkpoint."""

import json

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.ops import poseidon_bn254
from merlin_zkevm_prover_tpu.ops.bn254_field import R_MOD
from merlin_zkevm_prover_tpu.stark.merkle_bn128 import (
    MerkleTreeBN128,
    TranscriptBN128,
)


def test_poseidon_bn254_deterministic_and_bijective_ish():
    a = poseidon_bn254.permute(list(range(17)))
    b = poseidon_bn254.permute(list(range(17)))
    assert a == b
    assert all(0 <= x < R_MOD for x in a)
    c = poseidon_bn254.permute([1] + list(range(16)))
    assert c != a
    # hash16 depends on every input position
    h1 = poseidon_bn254.hash16([1, 2, 3])
    h2 = poseidon_bn254.hash16([1, 2, 4])
    h3 = poseidon_bn254.hash16([2, 1, 3])
    assert len({h1, h2, h3}) == 3


def test_bn128_tree_roundtrip():
    rng = np.random.default_rng(0)
    rows = [[int(x) for x in rng.integers(0, 1 << 63, 5)] for _ in range(40)]
    tree = MerkleTreeBN128(rows)
    root = tree.root()
    for idx in (0, 17, 39):
        row, sibs = tree.get_group_proof(idx)
        assert MerkleTreeBN128.verify_proof(root, idx, row, sibs)
    row, sibs = tree.get_group_proof(7)
    row = list(row)
    row[0] ^= 1
    assert not MerkleTreeBN128.verify_proof(root, 7, row, sibs)


def test_bn128_transcript():
    t1, t2 = TranscriptBN128(), TranscriptBN128()
    for t in (t1, t2):
        t.put([11, 22, 33])
    assert t1.get_field_fr() == t2.get_field_fr()
    gls = t1.get_fields_gl()
    assert len(gls) == 3
    idxs = t2.get_permutations(8, 10)
    assert len(idxs) == 8 and all(0 <= i < 1024 for i in idxs)


def test_checkpoint_roundtrip(tmp_path):
    from merlin_zkevm_prover_tpu.models.smoke import (
        build_smoke_air,
        smoke_const_values,
    )
    from merlin_zkevm_prover_tpu.stark import StarkProver, compile_air, verify
    from merlin_zkevm_prover_tpu.stark.checkpoint import (
        prove_from_checkpoint,
        save_commit_trace,
    )

    air, trace = build_smoke_air(n_bits=5)
    info = compile_air(air, n_queries=4, final_bits=3, fri_fold_bits=2)
    prover = StarkProver(info, smoke_const_values(air))
    path = str(tmp_path / "zkevm.commit.npz")
    save_commit_trace(path, trace)
    proof = prove_from_checkpoint(prover, path)
    assert verify(info, prover.const_tree.root(), proof)


def test_cli_process_batch(tmp_path):
    from merlin_zkevm_prover_tpu.main import main

    rom = {
        "program": [
            {"CONST": "5", "setA": 1},
            {"inA": "2", "setB": 1},
            {"JMP": 1, "useJmpAddr": 1, "jmpAddr": 2},
        ],
        "labels": {}, "constants": {},
    }
    rom_path = tmp_path / "rom.json"
    rom_path.write_text(json.dumps(rom))
    inp = tmp_path / "input.json"
    inp.write_text(json.dumps({}))
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({
        "romFile": str(rom_path),
        "runFileProcessBatch": str(inp),
    }))
    assert main(["-c", str(cfg)]) == 0

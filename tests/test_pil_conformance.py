"""Conformance of real executor traces against the real zkEVM PIL
(VERDICT r1 item 2 driver: measures the distance to full-PIL proving)."""

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
def test_zkevm_pil_conformance_on_real_batch():
    from merlin_zkevm_prover_tpu.executor.executor import Executor
    from merlin_zkevm_prover_tpu.executor.input import (
        load_db_into,
        load_input,
    )
    from merlin_zkevm_prover_tpu.executor.rom import load_rom
    from merlin_zkevm_prover_tpu.hashdb.hashdb import HashDB
    from merlin_zkevm_prover_tpu.models import zkevm_constants as zc
    from merlin_zkevm_prover_tpu.stark.pil_conformance import (
        check_conformance,
        executor_cm_columns,
    )

    rom = load_rom(ROM)
    d = json.load(open(VEC))
    hashdb = HashDB()
    load_db_into(hashdb, d)
    n_bits = 14
    ex = Executor(rom, hashdb, n_bits=n_bits)
    res = ex.execute(load_input(d))
    cm = executor_cm_columns(res)
    const = zc.build_all(1 << n_bits)
    # strict=False until every keccak-pipeline producer emits PIL-exact
    # column names (PaddingPG/KK lastBlock, KeccakF a/b/c split)
    rep = check_conformance(PIL, cm, const, n_bits, strict=False)
    print("\n" + rep.summary())
    # ratchet: round-3 floor is 548/631 with the selEq mapping fixed
    # (round 2's 549 included vacuously-passing arith identities)
    assert rep.n_passed >= 548, rep.summary()
    assert rep.by_file["arith.pil"] == (179, 179)
    assert rep.by_file["mem_align.pil"] == (52, 52)
    assert rep.by_file["poseidong.pil"] == (26, 26)
    assert rep.by_file["storage.pil"] == (46, 46)

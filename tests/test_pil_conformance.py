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
    from merlin_zkevm_prover_tpu.stark.pil_conformance import zkevm_publics

    cm = executor_cm_columns(res)
    const = zc.build_all(1 << n_bits)
    publics = zkevm_publics(json.load(open(PIL)), d)
    rep = check_conformance(PIL, cm, const, n_bits, publics=publics,
                            strict=True)
    print("\n" + rep.summary())
    # the full-PIL milestone: every polIdentity of the real 665-column
    # zkEVM circuit holds on a production batch trace with the real
    # publics pinned (keccak-family identities are vacuous at 2^14 —
    # the dedicated test below re-checks them with data at 2^19)
    assert rep.n_passed == 631, rep.summary()

    # plookup/permutation/connection arguments on the same trace.  At
    # 2^14 a known set cannot hold: range tables larger than the domain
    # (BYTE2 2^16, GL_SIGNED_22BITS 2^23, the binary byte table) and the
    # keccak family (needs one 155286-row slot -> 2^18) and the JMPN
    # low-23 decomposition (domain-coupled; reparametrized only in the
    # reduced-domain prove path).  Everything else must hold — the full
    # 48/48 is asserted by tests/test_zkevm_prove.py at 2^18.
    from merlin_zkevm_prover_tpu.models.zkevm import (
        build_zkevm_air,
        compact_reduced_tables,
    )
    from merlin_zkevm_prover_tpu.stark.pil_conformance import check_arguments

    pil = json.load(open(PIL))
    air = build_zkevm_air(n_bits=n_bits)
    compact_reduced_tables(air, dict(cm), const, pil)
    arep = check_arguments(pil, cm, const, n_bits, publics=publics, air=air)
    print("\n" + arep.summary())
    allowed = {
        "arith.pil:232", "arith.pil:237", "arith.pil:242", "arith.pil:247",
        "arith.pil:1916", "arith.pil:1917", "arith.pil:1918",
        "binary.pil:86", "binary.pil:87", "main.pil:208",
        "main.pil:663", "main.pil:678", "main.pil:687",
    }
    unexpected = {t: w for t, w in arep.failed.items()
                  if t.split(" ", 1)[1] not in allowed}
    assert not unexpected, unexpected
    assert len(arep.passed) >= 35, arep.summary()


@needs_ref
def test_keccak_family_conformance_at_full_slot_domain():
    """The keccak-pipeline SMs need >= one ~158k-row gate slot, so their
    identities are checked with real data at 2^19 (the batch-level test
    above runs at 2^14 where the keccak regions are empty-but-valid)."""
    from merlin_zkevm_prover_tpu.executor.sm.keccak_pipeline import (
        run_keccak_pipeline,
    )
    from merlin_zkevm_prover_tpu.models import zkevm_constants as zc
    from merlin_zkevm_prover_tpu.stark.pil_conformance import (
        check_conformance,
    )

    n_bits = 19
    n = 1 << n_bits
    inputs = [b"", b"abc", b"hello zkevm" * 30, bytes(range(256))]
    out = run_keccak_pipeline(
        [{"addr": i, "data": d, "reads": [], "lenCalled": True,
          "digestCalled": True} for i, d in enumerate(inputs)], n)
    cm = {}
    for sm, ns in (("paddingKK", "PaddingKK"),
                   ("paddingKKBit", "PaddingKKBit"),
                   ("bits2field", "Bits2Field"), ("keccakF", "KeccakF")):
        for name, col in out[sm].items():
            cm[f"{ns}.{name}"] = col
    const = {}
    const.update(zc.global_constants(n))
    const.update(zc.bits2field_constants(n))
    const.update(zc.padding_kk_constants(n))
    const.update(zc.padding_kkbit_constants(n))
    const.update(zc.keccak_f_constants(n))
    files = {"padding_kk.pil", "padding_kkbit.pil", "bits2field.pil",
             "keccakf.pil"}
    rep = check_conformance(PIL, cm, const, n_bits, files=files)
    assert rep.by_file["padding_kk.pil"] == (37, 37), rep.summary()
    assert rep.by_file["padding_kkbit.pil"] == (14, 14), rep.summary()
    assert rep.by_file["bits2field.pil"] == (3, 3), rep.summary()
    assert rep.by_file["keccakf.pil"] == (2, 2), rep.summary()

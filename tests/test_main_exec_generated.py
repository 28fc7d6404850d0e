"""Generated fast executor vs the interpreter (main_exec_generated role,
reference src/main_generator/main_generator.cpp + executor.cpp:140-173).

Parity gates: identical newStateRoot and counters on a real reference
batch vector, through the same process_batch surface."""

import json
import os
import time

import pytest

VEC = "/root/reference/testvectors/batchProof/input_executor_0.json"

needs_ref = pytest.mark.skipif(not os.path.exists(VEC),
                               reason="reference testvectors not present")

ROM = "/root/reference/src/main_sm/fork_5/scripts/rom.json"


def _run(use_generated: bool):
    from merlin_zkevm_prover_tpu.executor.executor import Executor
    from merlin_zkevm_prover_tpu.executor.input import (
        load_db_into,
        load_input,
    )
    from merlin_zkevm_prover_tpu.executor.rom import load_rom
    from merlin_zkevm_prover_tpu.hashdb.hashdb import HashDB

    d = json.load(open(VEC))
    hashdb = HashDB()
    load_db_into(hashdb, d)
    ex = Executor(load_rom(ROM), hashdb, n_bits=20,
                  use_generated=use_generated)
    t0 = time.time()
    res = ex.process_batch(load_input(d))
    return res, time.time() - t0


@needs_ref
def test_generated_matches_interpreter_on_real_batch():
    ref, t_interp = _run(False)
    gen, t_gen = _run(True)
    assert gen.new_state_root == ref.new_state_root
    assert gen.counters == ref.counters
    # informational: the generated path should not be slower
    print(f"interpreter {t_interp:.2f}s generated {t_gen:.2f}s "
          f"({t_interp / max(t_gen, 1e-9):.2f}x)")


@needs_ref
def test_generated_source_is_rom_specialized():
    from merlin_zkevm_prover_tpu.executor.main_exec_generated import (
        generate_source,
    )
    from merlin_zkevm_prover_tpu.executor.rom import load_rom

    rom = load_rom(ROM)
    src = generate_source(rom)
    # one function per ROM line, flags folded away (no flag() calls)
    assert src.count("def step_") == rom.size
    assert ".flag(" not in src

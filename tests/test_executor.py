"""Main SM interpreter tests over hand-written mini-ROMs in the reference
rom.json format, plus loading the real fork_5 ROM when present."""

import json
import os

import pytest

from merlin_zkevm_prover_tpu.executor.main_executor import (
    ExecutorError,
    MainExecutor,
    fea8,
)
from merlin_zkevm_prover_tpu.executor.rom import load_rom
from merlin_zkevm_prover_tpu.hashdb.smt import ZERO4, fea2scalar
from merlin_zkevm_prover_tpu.utils.keccak import keccak256

REF_ROM = "/root/reference/src/main_sm/fork_5/scripts/rom.json"


def run(program, input_data=None, **kw):
    rom = load_rom({"program": program, "labels": {}, "constants": {}})
    ex = MainExecutor(rom, max_steps=10000, **kw)
    return ex.execute(input_data)


END = {"JMP": 1, "useJmpAddr": 1}  # placeholder; replaced per program


def halt(addr):
    return {"JMP": 1, "useJmpAddr": 1, "jmpAddr": addr}


def test_const_and_set():
    ctx = run([
        {"CONST": "42", "setA": 1},
        {"CONSTL": str(1 << 200), "setB": 1},
        halt(2),
    ])
    assert fea2scalar(ctx.A) == 42
    assert fea2scalar(ctx.B) == 1 << 200


def test_register_moves_and_add():
    ctx = run([
        {"CONST": "7", "setA": 1},
        {"inA": "2", "CONST": "1", "setB": 1},   # B = 2*A + 1 = 15
        {"inA": "1", "inB": "1", "setC": 1},     # C = 22
        halt(3),
    ])
    assert fea2scalar(ctx.C) == 22


def test_jmpn_and_jmpz():
    # JMPN: A=-1 -> jump to 3; else fall through sets B=1
    ctx = run([
        {"CONST": "-1", "setA": 1},
        {"inA": "1", "JMPN": 1, "useJmpAddr": 1, "jmpAddr": 3},
        {"CONST": "1", "setB": 1},
        {"CONST": "9", "setC": 1},
        halt(4),
    ])
    assert fea2scalar(ctx.B) == 0
    assert fea2scalar(ctx.C) == 9
    # JMPZ with zero -> jump
    ctx = run([
        {"CONST": "0", "setA": 1},
        {"inA": "1", "JMPZ": 1, "useJmpAddr": 1, "jmpAddr": 3},
        {"CONST": "1", "setB": 1},
        halt(3),
    ])
    assert fea2scalar(ctx.B) == 0


def test_call_return_and_repeat():
    ctx = run([
        {"call": 1, "useJmpAddr": 1, "jmpAddr": 3},      # 0
        {"CONST": "5", "setB": 1},                        # 1 (after return)
        halt(2),                                          # 2
        {"CONST": "77", "setA": 1, "return": 1},          # 3 subroutine
    ])
    assert fea2scalar(ctx.A) == 77
    assert fea2scalar(ctx.B) == 5
    # repeat: the line stays while the ROW-ENTRY RCX is nonzero and runs
    # once more at RCX=0 (reference main_executor.cpp:3976-3979), so
    # RCX=3 executes the instruction 4 times
    ctx = run([
        {"CONST": "3", "setRCX": 1},
        {"inA": "1", "CONST": "1", "setA": 1, "repeat": 1},  # A += 1, x4
        halt(2),
    ])
    assert fea2scalar(ctx.A) == 4


def test_memory_rw_with_ctx():
    ctx = run([
        {"CONST": "1", "setCTX": 1},
        {"CONSTL": str(0xDEADBEEF), "setA": 1},
        {"inA": "1", "mOp": 1, "mWR": 1, "useCTX": 1, "offset": 5},
        {"inFREE": "1", "mOp": 1, "mWR": 0, "useCTX": 1, "offset": 5,
         "setB": 1},
        halt(4),
    ])
    assert fea2scalar(ctx.B) == 0xDEADBEEF
    assert any(m["wr"] for m in ctx.required.memory)


def test_binary_add_carry_and_jmpc():
    big = (1 << 256) - 1
    ctx = run([
        {"CONSTL": str(big), "setA": 1},
        {"CONSTL": "5", "setB": 1},
        # free input computes (A+B) mod 2^256; bin verifies and sets carry
        {"freeInTag": {"op": "add", "values": [
            {"op": "getReg", "regName": "A"},
            {"op": "getReg", "regName": "B"}]},
         "inFREE": "1", "bin": 1, "binOpcode": 0, "setC": 1},
        {"JMPC": 1, "useJmpAddr": 1, "jmpAddr": 5},
        {"CONST": "1", "setD": 1},   # skipped (carry taken)
        halt(5),
    ])
    assert fea2scalar(ctx.C) == 4
    assert fea2scalar(ctx.D) == 0
    assert ctx.counters.binary == 1


def test_storage_write_read():
    ctx = run([
        {"CONST": "123", "setC": 1},                        # key input C
        {"CONSTL": str(999), "setD": 1},                    # value in D
        {"inFREE": "1", "sWR": 1, "setSR": 1,
         "freeInTag": {"op": ""}},                          # SR = new root
        {"inFREE": "1", "sRD": 1, "setA": 1,
         "freeInTag": {"op": ""}},                          # A = stored value
        halt(4),
    ])
    assert fea2scalar(ctx.A) == 999
    assert any(s.b_is_set for s in ctx.required.storage)
    assert ctx.counters.poseidon_g >= 4


def test_hashk_digest():
    # absorb 32 bytes of A then 1 byte, then digest
    val = 0x11223344556677889900AABBCCDDEEFF << 128
    ctx = run([
        {"CONSTL": str(val), "setA": 1},
        {"CONST": "32", "setD": 1},
        {"inA": "1", "hashK": 1, "offset": 0},
        {"CONST": "7", "hashK1": 1, "offset": 0},
        {"CONST": "33", "hashKLen": 1, "offset": 0},
        {"inFREE": "1", "hashKDigest": 1, "offset": 0, "setB": 1,
         "freeInTag": {"op": ""}},
        halt(6),
    ])
    expect = int.from_bytes(
        keccak256(val.to_bytes(32, "big") + b"\x07"), "big"
    )
    assert fea2scalar(ctx.B) == expect
    assert ctx.counters.keccak_f >= 1


def test_free_input_commands_and_vars():
    ctx = run([
        {"freeInTag": {"op": "setVar", "varName": "x",
                       "values": [{"op": "number", "num": "1000"}]},
         "inFREE": "1", "setA": 1},
        {"freeInTag": {"op": "div", "values": [
            {"op": "getVar", "varName": "x"},
            {"op": "number", "num": "7"}]},
         "inFREE": "1", "setB": 1},
        {"freeInTag": {"op": "mod", "values": [
            {"op": "getVar", "varName": "x"},
            {"op": "number", "num": "7"}]},
         "inFREE": "1", "setC": 1},
        halt(3),
    ])
    assert fea2scalar(ctx.B) == 142
    assert fea2scalar(ctx.C) == 6


def test_assert_failure():
    with pytest.raises(ExecutorError):
        run([
            {"CONST": "1", "setA": 1},
            {"CONST": "2", "assert": 1},
            halt(2),
        ])


def test_input_functions():
    ctx = run([
        {"freeInTag": {"op": "functionCall",
                       "funcName": "getSequencerAddr", "params": []},
         "inFREE": "1", "setA": 1},
        halt(1),
    ], input_data={"sequencerAddr": 0xABCDEF})
    assert fea2scalar(ctx.A) == 0xABCDEF


@pytest.mark.skipif(not os.path.exists(REF_ROM),
                    reason="reference ROM not mounted")
def test_load_reference_rom():
    rom = load_rom(REF_ROM)
    assert rom.size == 5045
    assert rom.label("mapping_opcodes") >= 0 or len(rom.labels) > 0
    # every line parsed with known fields
    line0 = rom.lines[0]
    assert line0.ins.get("inSTEP") == 1
    assert line0.flag("setA") == 1


def test_event_log_tracer():
    ctx = run([
        {"cmdBefore": [{"op": "functionCall", "funcName": "eventLog",
                        "params": [{"op": "getVar",
                                    "varName": "onProcessTx"}]}],
         "CONST": "1", "setA": 1},
        {"cmdAfter": [{"op": "functionCall", "funcName": "eventLog",
                       "params": [{"op": "getVar", "varName": "onFinishTx"},
                                  {"op": "number", "num": "21000"}]}],
         "CONST": "2", "setB": 1},
        halt(2),
    ], input_data={"traceConfig": {"enabled": True}})
    assert ctx.tracer is not None
    trace = ctx.tracer.result()
    assert len(trace.txs) == 1
    assert trace.txs[0].gas_used == 21000
    assert any(e["event"] == "onProcessTx" for e in trace.events)

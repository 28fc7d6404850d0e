"""Secondary SM trace-filler tests + full-mode Executor dispatch."""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.executor.executor import Executor
from merlin_zkevm_prover_tpu.executor.rom import load_rom
from merlin_zkevm_prover_tpu.executor.sm import (
    ArithExecutor,
    BinaryExecutor,
    MemAlignExecutor,
    MemoryExecutor,
    PoseidonGExecutor,
)
from merlin_zkevm_prover_tpu.ops import poseidon_gl

M256 = (1 << 256) - 1


def test_binary_traces():
    ex = BinaryExecutor()
    a = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF
    acts = [
        {"a": a, "b": 5, "c": (a + 5) & M256, "opcode": 0},        # ADD carry
        {"a": 3, "b": 5, "c": (3 - 5) & M256, "opcode": 1},        # SUB borrow
        {"a": 3, "b": 5, "c": 1, "opcode": 2},                     # LT
        {"a": M256, "b": 1, "c": 1, "opcode": 3},                  # SLT (-1<1)
        {"a": 7, "b": 7, "c": 1, "opcode": 4},                     # EQ
        {"a": 0b1100, "b": 0b1010, "c": 0b1000, "opcode": 5},      # AND
        {"a": 0b1100, "b": 0b1010, "c": 0b1110, "opcode": 6},      # OR
        {"a": 0b1100, "b": 0b1010, "c": 0b0110, "opcode": 7},      # XOR
    ]
    pols = ex.execute(acts, 256)
    # ADD with wraparound sets final carry; results live on the latch row
    # (16 rows per action, reference STEPS)
    assert pols["lCout"][16] == 1
    assert pols["resultBinOp"][16] == 1
    # registers hold the full accumulated values on the latch row
    c_latch = sum(int(pols[f"c{i}"][16]) << (32 * i) for i in range(8))
    assert c_latch == (a + 5) & M256
    # LT result: c0 register carries the 0/1 result at its latch row
    assert pols["c0"][3 * 16] == 1 and pols["useCarry"][3 * 16 - 1] == 1
    # bad trace rejected
    with pytest.raises(ValueError):
        ex.execute([{"a": 1, "b": 1, "c": 3, "opcode": 0}], 64)


def test_memory_trace_sorted_and_validated():
    ex = MemoryExecutor()
    acc = [
        {"addr": 5, "step": 2, "wr": False, "value": [9] + [0] * 7},
        {"addr": 5, "step": 1, "wr": True, "value": [9] + [0] * 7},
        {"addr": 3, "step": 0, "wr": True, "value": [7] + [0] * 7},
    ]
    pols = ex.execute(acc, 16)
    assert list(pols["addr"][:3]) == [3, 5, 5]
    assert list(pols["lastAccess"][:3]) == [1, 0, 1]
    bad = [{"addr": 1, "step": 0, "wr": False, "value": [1] + [0] * 7}]
    with pytest.raises(ValueError):
        ex.execute(bad, 16)


def test_poseidon_g_trace():
    ex = PoseidonGExecutor()
    state = list(range(12))
    digest = poseidon_gl.permute_host(state)[:4]
    pols = ex.execute([state + digest], 62)
    assert pols["hash0"][0] == digest[0]
    # last round row equals the final permutation state prefix
    final = poseidon_gl.permute_host(state)
    assert pols["in0"][30] == final[0]
    with pytest.raises(ValueError):
        ex.execute([state + [digest[0] + 1, *digest[1:]]], 62)


def test_arith_trace_eq0_and_ec():
    ex = ArithExecutor()
    x1, y1, x2 = 123456789, 987654321, 555
    prod = x1 * y1 + x2
    act0 = {"x1": x1, "y1": y1, "x2": x2, "y2": prod >> 256,
            "y3": prod & M256, "eq": 0}
    FPEC = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
    # secp256k1 generator doubling
    gx = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
    gy = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
    s = (3 * gx * gx) * pow(2 * gy, FPEC - 2, FPEC) % FPEC
    x3 = (s * s - 2 * gx) % FPEC
    y3 = (s * (gx - x3) - gy) % FPEC
    act2 = {"x1": gx, "y1": gy, "x2": gx, "y2": gy, "x3": x3, "y3": y3,
            "s": s, "eq": 2}
    pols = ex.execute([act0, act2], 128)
    assert pols["selEq0"][0] == 1
    # EC double rows carry selEq2+selEq3 and the derived slope limbs
    assert pols["selEq2"][32] == 1 and pols["selEq3"][32] == 1
    s_rec = sum(int(pols[f"s_{i}"][32]) << (16 * i) for i in range(16))
    assert s_rec == s
    with pytest.raises(ValueError):
        ex.execute([dict(act0, y3=act0["y3"] + 1)], 64)


def test_mem_align_trace():
    ex = MemAlignExecutor()
    m0 = int.from_bytes(bytes(range(32)), "big")
    m1 = int.from_bytes(bytes(range(32, 64)), "big")
    off = 5
    v = int.from_bytes(bytes(range(5, 37)), "big")   # unaligned read
    pols = ex.execute([{"m0": m0, "m1": m1, "offset": off, "v": v}], 64)
    assert pols["resultRd"][31] == 1
    # unaligned write
    val = int.from_bytes(b"\xAA" * 32, "big")
    full = bytearray(m0.to_bytes(32, "big") + m1.to_bytes(32, "big"))
    full[off:off + 32] = b"\xAA" * 32
    w0 = int.from_bytes(bytes(full[:32]), "big")
    w1 = int.from_bytes(bytes(full[32:]), "big")
    pols = ex.execute(
        [{"m0": m0, "m1": m1, "offset": off, "v": val, "wr256": 1,
          "w0": w0, "w1": w1}], 64
    )
    assert pols["resultWr256"][31] == 1
    with pytest.raises(ValueError):
        ex.execute([{"m0": m0, "m1": m1, "offset": off, "v": v + 1}], 64)


def test_full_executor_dispatch():
    program = [
        {"CONSTL": "7", "setA": 1},
        {"CONSTL": "9", "setB": 1},
        {"freeInTag": {"op": "add", "values": [
            {"op": "getReg", "regName": "A"},
            {"op": "getReg", "regName": "B"}]},
         "inFREE": "1", "bin": 1, "binOpcode": 0, "setC": 1},
        {"inC": "1", "mOp": 1, "mWR": 1, "offset": 3},
        {"JMP": 1, "useJmpAddr": 1, "jmpAddr": 4},
    ]
    rom = load_rom({"program": program, "labels": {}, "constants": {}})
    ex = Executor(rom, n_bits=10)
    res = ex.execute()
    assert res.ctx.counters.binary == 1
    assert res.sm_pols["binary"]["resultBinOp"][16] == 1
    assert res.sm_pols["memory"]["mOp"][0] == 1
    pb = ex.process_batch()
    assert pb.counters["cntBinary"] == 1


def test_storage_executor_replay():
    from merlin_zkevm_prover_tpu.executor.sm import StorageExecutor
    from merlin_zkevm_prover_tpu.hashdb.hashdb import HashDB
    from merlin_zkevm_prover_tpu.hashdb.smt import ZERO4

    h = HashDB()
    k1 = (5, 0, 0, 0)
    k2 = (7, 1, 0, 0)
    s1 = h.set("b", 0, ZERO4, k1, 111)
    s2 = h.set("b", 0, s1.new_root, k2, 222)
    g1 = h.get(s2.new_root, k1)
    assert g1.value == 111
    actions = [s1, s2, g1]
    ex = StorageExecutor()
    req_pg = []
    n = 1 << 10
    pols = ex.execute(actions, n, required_poseidon=req_pg)
    assert pols["iLatchSet"].sum() == 2
    assert pols["iLatchGet"].sum() == 1
    assert len(req_pg) >= 3
    # micro-ROM wrap: last row jumps back to pc=0
    assert pols["pc"][0] == 0 and pols["iJmp"][n - 1] == 1
    # the set's latch row pins the new root registers
    latch_row = int(pols["iLatchSet"].nonzero()[0][0])
    assert tuple(int(pols[f"newRoot{j}"][latch_row]) for j in range(4)) \
        == tuple(s1.new_root)
    # corrupted action rejected at the latch
    import copy

    import pytest as _pytest

    bad = copy.deepcopy(g1)
    bad.value = 999
    with _pytest.raises((ValueError, KeyError, AssertionError)):
        ex.execute([bad], n)


def test_keccak_gate_script_matches_keccak_f():
    from merlin_zkevm_prover_tpu.executor.sm.gate import evaluate
    from merlin_zkevm_prover_tpu.executor.sm.keccak_f_script import (
        bits_to_state,
        build_keccak_f_program,
        state_to_bits,
    )
    from merlin_zkevm_prover_tpu.utils.keccak import keccak_f

    prog = build_keccak_f_program()
    # gate count on the reference slot scale (155,286 rows per keccak-f)
    assert 100_000 < len(prog.gates) < 200_000

    rng = np.random.default_rng(0)
    words = [int(x) for x in rng.integers(0, 1 << 63, 25, dtype=np.uint64)]
    bits = state_to_bits(words)
    out = evaluate(prog, bits)
    got = bits_to_state(out)
    assert got == keccak_f(list(words))

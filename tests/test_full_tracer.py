"""FullTracer depth: call-stack tracking, opcode capture, traceConfig
gating (reference full_tracer.cpp onOpcode/onFinishTx)."""

import json
import os

import pytest

VEC = "/root/reference/testvectors/batchProof/input_executor_0.json"
needs_ref = pytest.mark.skipif(not os.path.exists(VEC),
                               reason="testvectors not present")


@pytest.fixture(scope="module")
def traced():
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
    ex = Executor(load_rom(
        "/root/reference/src/main_sm/fork_5/scripts/rom.json"), hashdb,
        n_bits=20)
    inp = load_input(d)
    inp["traceConfig"] = {"enabled": True, "enableMemory": True,
                          "enableReturnData": True}
    res = ex.process_batch(inp)
    return d, res.ctx.tracer


@needs_ref
def test_opcode_steps_captured(traced):
    d, tr = traced
    assert tr.trace.txs, "no transactions traced"
    tx = tr.trace.txs[0]
    assert tx.steps, "no opcode steps captured"
    ops = {s.opcode for s in tx.steps}
    assert "PUSH1" in ops or "PUSH2" in ops or "STOP" in ops
    # every step carries pc/gas/state_root and a sane depth
    for s in tx.steps:
        assert s.depth >= 1
        assert s.gas >= 0
        assert s.state_root > 0


@needs_ref
def test_gas_accounting(traced):
    d, tr = traced
    for tx in tr.trace.txs:
        assert tx.gas_used > 0
        assert tx.gas_used <= tx.gas_limit
        # opcode-level costs sum to roughly the execution gas (intrinsic
        # 21000 + calldata cost are charged outside opcodes)
        if tx.steps and tx.status == 1:
            spent = sum(max(s.gas_cost, 0) for s in tx.steps)
            assert spent <= tx.gas_used


@needs_ref
def test_stack_capture_shape(traced):
    """input_executor_0 is a plain ETH transfer (one STOP, empty stack);
    stack lists must exist (capture enabled) but stay empty."""
    d, tr = traced
    for tx in tr.trace.txs:
        for s in tx.steps:
            assert s.stack is not None
            assert all(v >= 0 for v in s.stack)


NFT = "/root/reference/testvectors/performance/nft_mints-133.json"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(NFT), reason="testvectors absent")
def test_contract_execution_trace_depth():
    """nft_mints: real contract execution — EVM-correct opcode stream,
    gas costs, stack, memory, SSTORE storage snapshots, logs and return
    data (reference onOpcode capture, full_tracer.cpp:1738-2345)."""
    from merlin_zkevm_prover_tpu.executor.executor import Executor
    from merlin_zkevm_prover_tpu.executor.input import (
        load_db_into,
        load_input,
    )
    from merlin_zkevm_prover_tpu.executor.rom import load_rom
    from merlin_zkevm_prover_tpu.hashdb.hashdb import HashDB

    d = json.load(open(NFT))
    hashdb = HashDB()
    load_db_into(hashdb, d)
    ex = Executor(load_rom(
        "/root/reference/src/main_sm/fork_5/scripts/rom.json"), hashdb,
        n_bits=23)
    inp = load_input(d)
    inp["traceConfig"] = {"enabled": True, "enableMemory": True,
                          "enableReturnData": True}
    res = ex.process_batch(inp)
    tr = res.ctx.tracer
    tx = tr.trace.txs[0]
    ops = [s.opcode for s in tx.steps]
    assert ops[0] == "PUSH1" and "MSTORE" in ops and "SSTORE" in ops
    # EVM-exact static costs on the decoded stream
    costs = {s.opcode: s.gas_cost for s in tx.steps}
    assert costs["PUSH1"] == 3 and costs["JUMPDEST"] == 1
    assert all(s.gas_cost >= 0 for s in tx.steps)
    assert any(s.stack for s in tx.steps)
    assert any(s.memory is not None for s in tx.steps)
    sstores = [s for s in tx.steps if s.op == 0x55]
    assert sstores and sstores[-1].storage
    assert tx.logs and tx.return_value


@needs_ref
def test_trace_config_gating(traced):
    """disableStack must suppress stack capture."""
    from merlin_zkevm_prover_tpu.executor.full_tracer import (
        FullTracer,
        TraceConfig,
    )

    cfg = TraceConfig.from_dict({"enabled": True, "disableStack": True})
    assert cfg.disable_stack
    tr = FullTracer(config=cfg)
    assert tr.config.disable_stack


@needs_ref
def test_full_trace_shape(traced):
    d, tr = traced
    ft = tr.full_trace(0)
    assert ft is not None
    assert "context" in ft and "steps" in ft
    assert ft["context"]["from"].startswith("0x")
    assert len(ft["steps"]) == len(tr.trace.txs[0].steps)
    assert tr.receipts()[0]["gasUsed"] == tr.trace.txs[0].gas_used

"""Prover orchestration + gRPC service-surface tests (aggregator channel
e2e loopback, executor ProcessBatch, hashdb remote) — the reference's
config_runFile_e2e.json flow over localhost."""

import json
import queue

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.models.smoke import (
    build_smoke_air,
    smoke_const_values,
)
from merlin_zkevm_prover_tpu.prover.backend import StarkCircuitBackend
from merlin_zkevm_prover_tpu.prover.prover import (
    Prover,
    ProverRequest,
    RequestType,
)
from merlin_zkevm_prover_tpu.stark import StarkProver, compile_air
from merlin_zkevm_prover_tpu.utils.config import Config


@pytest.fixture(scope="module")
def smoke_backend():
    air, trace = build_smoke_air(n_bits=5)
    info = compile_air(air, n_queries=4, final_bits=3, fri_fold_bits=2)
    prover = StarkProver(info, smoke_const_values(air))

    def trace_builder(input_data, exec_result):
        return trace, None

    return StarkCircuitBackend(info, prover, trace_builder,
                                recursion_mode="composite")


@pytest.fixture(scope="module")
def running_prover(smoke_backend):
    cfg = Config.load({"requestsPersistence": 3600})
    p = Prover(cfg, smoke_backend)
    yield p
    p.shutdown()


def test_prover_request_queue(running_prover):
    p = running_prover
    rid = p.submit_request(
        ProverRequest(RequestType.GEN_BATCH_PROOF, {})
    )
    req = p.wait_for_request(rid, timeout=600)
    assert req is not None and req.error == "", req.error
    assert req.result["type"] == "batch"
    # aggregation + final
    rid2 = p.submit_request(
        ProverRequest(RequestType.GEN_BATCH_PROOF, {})
    )
    req2 = p.wait_for_request(rid2, timeout=600)
    rid3 = p.submit_request(ProverRequest(
        RequestType.GEN_AGGREGATED_PROOF,
        {"proof1": req.result, "proof2": req2.result},
    ))
    agg = p.wait_for_request(rid3, timeout=600)
    assert agg.error == "" and agg.result["type"] == "aggregated"
    rid4 = p.submit_request(ProverRequest(
        RequestType.GEN_FINAL_PROOF, {"proof": agg.result}
    ))
    fin = p.wait_for_request(rid4, timeout=600)
    assert fin.error == "" and fin.result["type"] == "final"
    st = p.status()
    assert st["lastComputed"] == rid4


def test_aggregator_channel_e2e(running_prover):
    from merlin_zkevm_prover_tpu.service.aggregator import (
        AggregatorClient,
        AggregatorTestServer,
    )

    server = AggregatorTestServer()
    port = server.start()
    client = AggregatorClient(running_prover, f"127.0.0.1:{port}",
                              max_streams=1)
    client.start()
    result = server.results.get(timeout=900)
    server.stop()
    assert not isinstance(result, Exception), result
    final = json.loads(result)
    assert final["type"] == "final"
    assert final["aggregated"]["type"] == "aggregated"


def test_hashdb_service_roundtrip():
    from merlin_zkevm_prover_tpu.hashdb.hashdb import HashDB
    from merlin_zkevm_prover_tpu.service.hashdb_service import (
        HashDBRemote,
        HashDBServer,
        hashdb_client_factory,
    )

    server = HashDBServer(HashDB(), port=0)
    port = server.start()
    remote = HashDBRemote(f"127.0.0.1:{port}")
    res = remote.set("b1", 0, (0, 0, 0, 0), (5, 0, 0, 0), 1234)
    assert res.new_root != (0, 0, 0, 0)
    got = remote.get(res.new_root, (5, 0, 0, 0))
    assert got.value == 1234
    remote.set_program((1, 2, 3, 4), b"\x01\x02")
    assert remote.get_program((1, 2, 3, 4)) == b"\x01\x02"
    assert remote.flush() >= 0
    st = remote.get_flush_status()
    assert "stored_flush_id" in st
    # factory returns local for 'local'
    local = hashdb_client_factory("local")
    assert hasattr(local, "smt")
    server.stop()


def test_executor_service_roundtrip():
    from merlin_zkevm_prover_tpu.executor.executor import Executor
    from merlin_zkevm_prover_tpu.executor.rom import load_rom
    from merlin_zkevm_prover_tpu.service.executor_service import (
        ExecutorClient,
        ExecutorServer,
    )

    program = [
        {"CONSTL": "7", "setA": 1},
        {"CONSTL": "9", "setB": 1},
        {"freeInTag": {"op": "add", "values": [
            {"op": "getReg", "regName": "A"},
            {"op": "getReg", "regName": "B"}]},
         "inFREE": "1", "bin": 1, "binOpcode": 0, "setC": 1},
        {"JMP": 1, "useJmpAddr": 1, "jmpAddr": 3},
    ]
    rom = load_rom({"program": program, "labels": {}, "constants": {}})
    server = ExecutorServer(Executor(rom, n_bits=10), port=0)
    port = server.start()
    client = ExecutorClient(f"127.0.0.1:{port}")
    res = client.process_batch(old_state_root=b"\x00" * 32, chain_id=1)
    assert res.error == 0
    assert res.cnt_binaries == 1
    server.stop()

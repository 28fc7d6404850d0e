"""Process entry point (reference src/main.cpp: `zkProver -c config.json`).

Launches the configured combination of services and file-mode runs:
aggregator client, executor server, hashdb server, and the
runFileGenBatchProof / runFileGenAggregatedProof / runFileGenFinalProof /
runFileProcessBatch one-shot modes (reference main.cpp:600-855).

Usage:  python -m merlin_zkevm_prover_tpu.main -c config.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from .executor.executor import Executor
from .executor.rom import load_rom
from .hashdb.hashdb import HashDB
from .models.smoke import build_smoke_air, smoke_const_values
from .prover.backend import StarkCircuitBackend
from .prover.prover import Prover, ProverRequest, RequestType
from .stark import StarkProver, compile_air
from .utils.config import Config
from .utils.timer import TimerLog
from .utils.zklog import zklog


def build_backend(config: Config) -> StarkCircuitBackend:
    """Assemble the proving backend from config.

    With romFile + pilFile configured, gen_batch_proof proves the REAL
    zkEVM circuit: the batch runs through the zkASM executor, its trace
    becomes main.pil's 665 committed columns, and the proof's 44 publics
    are bound to the batch's old/new state roots (reference
    prover.cpp:461-526).  Domain size comes from proverNBits (>= 18 for
    batches that hash data — one keccak slot; below 2^23 the
    reduced-domain instantiation of models/zkevm.py applies).  Without a
    pilFile the built-in smoke circuit is used (dev/loopback)."""
    pil_file = getattr(config, "pilFile", "") or ""
    if config.romFile and pil_file:
        from .models import zkevm as zkevm_model

        n_bits = config.proverNBits if config.proverNBits >= 14 else 18
        air = zkevm_model.build_zkevm_air(
            n_bits=n_bits, pil_path=pil_file, reparam_jmpn=n_bits < 23)
        info = zkevm_model.compile_zkevm(
            air, n_queries=max(config.proverNQueries, 16))
        zklog.info(f"zkEVM circuit at 2^{n_bits}: building constants ...")
        sprover = None  # built lazily: const LDE+tree is heavy
        sprover_key = None

        def trace_builder(input_data, exec_result):
            air2, cm1, const, publics, _res = zkevm_model.prepare_batch(
                input_data, n_bits, pil_path=pil_file,
                rom_path=config.romFile)
            nonlocal sprover, sprover_key
            # At reduced domains compact_reduced_tables makes the constant
            # matrix batch-dependent; at the full 2^23 domain constants are
            # batch-independent.  Key the cached prover (const LDE + Merkle
            # tree) on the const matrix content so a second, different
            # batch gets a matching const tree instead of the first
            # batch's compacted lookup tables.
            if n_bits >= 23:
                key = "full"
            else:
                import hashlib

                import numpy as _np

                key = hashlib.sha256(
                    _np.ascontiguousarray(const).tobytes()).hexdigest()
            if sprover is None or key != sprover_key:
                if sprover is not None:
                    zklog.info("const matrix changed; rebuilding prover "
                               "(reduced-domain batch-dependent constants)")
                sprover = StarkProver(info, const)
                sprover_key = key
                backend.stark_prover = sprover
            return cm1, publics

        # the trace builder runs its own (domain-scaled) executor; the
        # plain one below only serves the process_batch latency path
        trace_builder.self_executing = True
        rom = load_rom(config.romFile)
        executor = Executor(rom, HashDB(config.databaseURL))
        backend = StarkCircuitBackend(
            info, sprover, trace_builder, executor=executor,
            recursion_mode=getattr(config, "recursionMode", "full"),
            rec_queries=int(getattr(config, "recursionQueries", 32) or 32),
        )
        return backend

    air, default_trace = build_smoke_air(n_bits=config.proverNBits
                                         if config.proverNBits <= 10 else 5)
    info = compile_air(air, n_queries=config.proverNQueries,
                       final_bits=3, fri_fold_bits=2)
    sprover = StarkProver(info, smoke_const_values(air))
    executor = None
    if config.romFile:
        rom = load_rom(config.romFile)
        executor = Executor(rom, HashDB(config.databaseURL))

    def trace_builder(input_data, exec_result):
        return default_trace, None

    return StarkCircuitBackend(
        info, sprover, trace_builder, executor,
        recursion_mode=getattr(config, "recursionMode", "full"),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="merlin-zkevm-prover-tpu")
    ap.add_argument("-c", "--config", default="", help="config JSON path")
    args = ap.parse_args(argv)

    config = Config.load(args.config) if args.config else Config()
    zklog.set_prefix(f"{config.proverID or 'tpu'} " if config.proverID
                     else "")
    zklog.info(f"merlin-zkevm-prover-tpu starting; config="
               f"{args.config or '<default>'}")

    backend = build_backend(config)
    prover = Prover(config, backend)
    servers = []

    if config.runHashDBServer:
        from .service.hashdb_service import HashDBServer

        s = HashDBServer(HashDB(config.databaseURL),
                         port=config.hashDBServerPort)
        s.start()
        servers.append(s)
        zklog.info(f"HashDB server on :{s.port}")

    if config.runExecutorServer:
        from .service.executor_service import ExecutorServer

        assert backend.executor is not None, "executor requires romFile"
        s = ExecutorServer(backend.executor, port=config.executorServerPort)
        s.start()
        servers.append(s)
        zklog.info(f"Executor server on :{s.port}")

    agg_server = None
    if config.runAggregatorServer:
        from .service.aggregator import AggregatorTestServer

        agg_server = AggregatorTestServer(port=config.aggregatorServerPort)
        agg_server.start()
        servers.append(agg_server)
        zklog.info(f"Aggregator (test) server on :{agg_server.port}")

    client = None
    if config.runAggregatorClient:
        from .service.aggregator import AggregatorClient

        client = AggregatorClient(
            prover,
            f"{config.aggregatorClientHost}:{config.aggregatorClientPort}",
            max_streams=config.aggregatorClientMaxStreams,
        )
        client.start()
        zklog.info("Aggregator client started")

    rc = 0
    # ---- file modes ----
    def run_file(mode: RequestType, path: str):
        with open(path) as f:
            input_data = json.load(f)
        rid = prover.submit_request(ProverRequest(mode, input_data))
        req = prover.wait_for_request(rid)
        if req.error:
            zklog.error(f"{mode.value} failed: {req.error}")
            return 1
        if config.saveProofToFile:
            out = f"{config.outputPath}/{mode.value}.{rid}.json"
            with open(out, "w") as f:
                json.dump(req.result, f)
            zklog.info(f"{mode.value} written to {out}")
        return 0

    if config.runFileProcessBatch:
        rc |= run_file(RequestType.PROCESS_BATCH, config.runFileProcessBatch)
    if config.runFileGenBatchProof:
        rc |= run_file(RequestType.GEN_BATCH_PROOF,
                       config.runFileGenBatchProof)
    if config.runFileGenAggregatedProof:
        rc |= run_file(RequestType.GEN_AGGREGATED_PROOF,
                       config.runFileGenAggregatedProof)
    if config.runFileGenFinalProof:
        rc |= run_file(RequestType.GEN_FINAL_PROOF,
                       config.runFileGenFinalProof)

    if client is not None and config.aggregatorClientMaxStreams:
        # e2e loopback mode: exit after the configured number of streams
        client.join(timeout=3600)
    elif servers and not (config.runFileProcessBatch
                          or config.runFileGenBatchProof):
        zklog.info("serving; ctrl-c to exit")
        try:
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            pass

    for s in servers:
        s.stop()
    prover.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())

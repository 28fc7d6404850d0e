"""Executor gRPC service (reference src/service/executor/executor_service
.cpp): the latency-path ProcessBatch RPC mapping proto <-> Input."""

from __future__ import annotations

import sys
from concurrent import futures
from pathlib import Path
from typing import Optional

import grpc

sys.path.insert(0, str(Path(__file__).parent / "gen"))
import executor_pb2  # noqa: E402

from ..executor.executor import Executor  # noqa: E402

_SERVICE = "executor.v1.ExecutorService"


class ExecutorServer:
    def __init__(self, executor: Executor, port: int = 50071):
        self.executor = executor
        self.port = port
        self.server: Optional[grpc.Server] = None

    def _process_batch(self, req, ctx):
        input_data = {
            "oldStateRoot": int.from_bytes(req.old_state_root, "big"),
            "oldAccInputHash": int.from_bytes(req.old_acc_input_hash, "big"),
            "oldBatchNum": req.old_batch_num,
            "chainID": req.chain_id,
            "forkID": req.fork_id,
            "batchL2Data": req.batch_l2_data,
            "globalExitRoot": int.from_bytes(req.global_exit_root, "big"),
            "timestamp": req.eth_timestamp,
            "sequencerAddr": int(req.coinbase, 16) if req.coinbase else 0,
            "noCounters": bool(req.no_counters),
        }
        try:
            res = self.executor.process_batch(input_data)
        except Exception as e:  # noqa: BLE001 — becomes an error response
            return executor_pb2.ProcessBatchResponse(error=1)
        c = res.counters
        new_root = sum(int(v) << (64 * i)
                       for i, v in enumerate(res.new_state_root))
        return executor_pb2.ProcessBatchResponse(
            new_state_root=new_root.to_bytes(32, "big"),
            cnt_keccak_hashes=c["cntKeccakF"],
            cnt_poseidon_hashes=c["cntPoseidonG"],
            cnt_poseidon_paddings=c["cntPaddingPG"],
            cnt_mem_aligns=c["cntMemAlign"],
            cnt_arithmetics=c["cntArith"],
            cnt_binaries=c["cntBinary"],
            cnt_steps=c["cntSteps"],
            error=0,
        )

    def _get_flush_status(self, req, ctx):
        st = self.executor.hashdb.get_flush_status()
        return executor_pb2.GetFlushStatusResponse(
            stored_flush_id=st["stored_flush_id"],
            last_flush_id=st["pending_flush_id"],
        )

    def start(self) -> int:
        handlers = {
            "ProcessBatch": grpc.unary_unary_rpc_method_handler(
                self._process_batch,
                request_deserializer=executor_pb2.ProcessBatchRequest.FromString,
                response_serializer=lambda m: m.SerializeToString(),
            ),
            "GetFlushStatus": grpc.unary_unary_rpc_method_handler(
                self._get_flush_status,
                request_deserializer=executor_pb2.Empty.FromString,
                response_serializer=lambda m: m.SerializeToString(),
            ),
        }
        self.server = grpc.server(futures.ThreadPoolExecutor(max_workers=8))
        self.server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(_SERVICE, handlers),)
        )
        self.port = self.server.add_insecure_port(f"127.0.0.1:{self.port}")
        self.server.start()
        return self.port

    def stop(self):
        if self.server:
            self.server.stop(grace=1)


class ExecutorClient:
    def __init__(self, target: str):
        self.channel = grpc.insecure_channel(target)
        self._pb = self.channel.unary_unary(
            f"/{_SERVICE}/ProcessBatch",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=executor_pb2.ProcessBatchResponse.FromString,
        )

    def process_batch(self, **kwargs) -> executor_pb2.ProcessBatchResponse:
        return self._pb(executor_pb2.ProcessBatchRequest(**kwargs))

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
        if req.HasField("trace_config"):
            t = req.trace_config
            input_data["traceConfig"] = {
                "enabled": True,
                "disableStorage": bool(t.disable_storage),
                "disableStack": bool(t.disable_stack),
                "enableMemory": bool(t.enable_memory),
                "enableReturnData": bool(t.enable_return_data),
            }
        try:
            res = self.executor.process_batch(input_data)
        except Exception:  # noqa: BLE001 — becomes an error response
            return executor_pb2.ProcessBatchResponse(error=1)
        c = res.counters
        new_root = sum(int(v) << (64 * i)
                       for i, v in enumerate(res.new_state_root))
        out = executor_pb2.ProcessBatchResponse(
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
        tracer = getattr(res.ctx, "tracer", None)
        if tracer is not None:
            self._fill_trace(out, tracer, with_steps="traceConfig"
                             in input_data)
        return out

    @staticmethod
    def _fill_trace(out, tracer, with_steps: bool):
        """Map FullTracer results onto the reference response schema
        (reference executor_service.cpp:200-360)."""
        bt = tracer.result()
        out.cumulative_gas_used = bt.gas_used
        for addr, info in tracer.read_write_addresses.items():
            rw = out.read_write_addresses[addr]
            rw.nonce = info.get("nonce", "")
            rw.balance = info.get("balance", "")
        for tx in bt.txs:
            r = out.responses.add()
            r.return_value = tx.return_value
            r.gas_left = max(tx.gas_limit - tx.gas_used, 0)
            r.gas_used = tx.gas_used
            r.gas_refunded = tx.gas_refunded
            r.error = 0 if tx.status else 1
            r.create_address = (f"0x{tx.create_address:040x}"
                                if tx.create_address else "")
            r.state_root = int(tx.state_root).to_bytes(32, "big")
            r.effective_gas_price = str(tx.gas_price)
            for lg in tx.logs:
                l = r.logs.add()
                l.address = f"0x{lg.address:040x}"
                for t in lg.topics:
                    l.topics.append(int(t).to_bytes(32, "big"))
                l.data = b"".join(
                    int(d).to_bytes(32, "big") for d in lg.data)
                l.index = lg.index
            cc = tx.context
            r.call_trace.context.CopyFrom(r.call_trace.context.__class__(
                type=cc.type, data=cc.data, gas=cc.gas,
                value=str(cc.value), output=cc.output,
                gas_used=cc.gas_used, gas_price=str(tx.gas_price),
                **{"from": f"0x{cc.from_addr:040x}"},
                to=f"0x{cc.to_addr:040x}" if cc.to_addr else "0x",
            ))
            if with_steps:
                for s in tx.steps:
                    st = r.execution_trace.add()
                    st.state_root = int(s.state_root).to_bytes(32, "big")
                    st.depth = s.depth
                    st.pc = s.pc
                    st.gas = s.gas
                    st.gas_cost = max(s.gas_cost, 0)
                    st.gas_refund = s.gas_refund
                    st.op = s.op
                    if s.stack is not None:
                        st.stack.extend(hex(v) for v in s.stack)
                    if s.memory is not None:
                        st.memory = bytes(s.memory)
                        st.memory_size = s.memory_size
                        st.memory_offset = s.memory_offset
                    if s.return_data is not None:
                        st.return_data = bytes(s.return_data)

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

"""Aggregator channel: client (prover side) and test server.

The prover CONNECTS OUT to the aggregator and serves requests over one
bidirectional stream (reference src/service/aggregator/aggregator_client
.cpp:554-640).  The server here is the test/e2e twin (reference embeds
the mock server the same way, main.cpp:687-695): it drives
batch -> batch -> aggregated -> final over localhost, like
testvectors/config_runFile_e2e.json.
"""

from __future__ import annotations

import json
import queue
import sys
import threading
import uuid as uuid_mod
from concurrent import futures
from pathlib import Path
from typing import Dict, List, Optional

import grpc

sys.path.insert(0, str(Path(__file__).parent / "gen"))
import aggregator_pb2  # noqa: E402

from ..prover.prover import Prover, ProverRequest, RequestType  # noqa: E402
from ..utils.zklog import zklog  # noqa: E402

_SERVICE = "aggregator.v1.AggregatorService"


class AggregatorClient:
    """Runs the prover side of the Channel stream."""

    def __init__(self, prover: Prover, target: str, max_streams: int = 0):
        self.prover = prover
        self.target = target
        self.max_streams = max_streams
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._outgoing: "queue.Queue" = queue.Queue()

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def join(self, timeout=None):
        if self._thread:
            self._thread.join(timeout)

    def _run(self):
        streams = 0
        while not self._stop.is_set():
            channel = grpc.insecure_channel(self.target)
            stream = channel.stream_stream(
                f"/{_SERVICE}/Channel",
                request_serializer=lambda m: m.SerializeToString(),
                response_deserializer=aggregator_pb2.AggregatorMessage.FromString,
            )
            try:
                self._serve_stream(stream)
            except grpc.RpcError as e:
                zklog.warning(f"aggregator stream ended: {e.code()}")
            channel.close()
            streams += 1
            if self.max_streams and streams >= self.max_streams:
                break
        self._stop.set()

    def _serve_stream(self, stream):
        out_q: "queue.Queue" = queue.Queue()

        def outgoing():
            while True:
                msg = out_q.get()
                if msg is None:
                    return
                yield msg

        responses = stream(outgoing())
        for agg_msg in responses:
            reply = self._handle(agg_msg)
            out_q.put(reply)
            if self._stop.is_set():
                break
        out_q.put(None)

    def _handle(self, msg) -> "aggregator_pb2.ProverMessage":
        out = aggregator_pb2.ProverMessage(id=msg.id)
        which = msg.WhichOneof("request")
        if which == "get_status_request":
            st = self.prover.status()
            out.get_status_response.status = (
                aggregator_pb2.GetStatusResponse.STATUS_COMPUTING
                if st["status"] == "computing"
                else aggregator_pb2.GetStatusResponse.STATUS_IDLE
            )
            out.get_status_response.prover_name = st["proverName"]
            out.get_status_response.prover_id = st["proverID"]
            # full GetStatusResponse parity (ref aggregator.proto:150-176)
            r = out.get_status_response
            r.last_computed_request_id = st.get("lastComputedRequestId", "")
            r.last_computed_end_time = int(st.get("lastComputedEndTime", 0))
            r.current_computing_request_id = st.get(
                "currentComputingRequestId", "")
            r.current_computing_start_time = int(
                st.get("currentComputingStartTime", 0))
            r.version_proto = "v0_0_1"
            r.version_server = st.get("version", "0.0.1")
            r.pending_request_queue_ids.extend(
                st.get("pendingRequestQueueIds", []))
            r.fork_id = int(st.get("forkID", 5))
            try:
                import os as _os

                r.number_of_cores = _os.cpu_count() or 0
                with open("/proc/meminfo") as f:
                    mem = {ln.split(":")[0]: int(ln.split()[1])
                           for ln in f if ":" in ln}
                r.total_memory = mem.get("MemTotal", 0) * 1024
                r.free_memory = mem.get("MemAvailable", 0) * 1024
            except Exception:  # pragma: no cover
                pass
        elif which == "gen_batch_proof_request":
            inp = msg.gen_batch_proof_request.input
            input_data = {
                "oldStateRoot": int.from_bytes(
                    inp.public_inputs.old_state_root, "big"
                ),
                "batchL2Data": inp.public_inputs.batch_l2_data,
                "globalExitRoot": int.from_bytes(
                    inp.public_inputs.global_exit_root, "big"
                ),
                "timestamp": inp.public_inputs.eth_timestamp,
                "chainID": inp.public_inputs.chain_id,
                "forkID": inp.public_inputs.fork_id,
            }
            rid = self.prover.submit_request(
                ProverRequest(RequestType.GEN_BATCH_PROOF, input_data)
            )
            out.gen_batch_proof_response.id = rid
            out.gen_batch_proof_response.result = aggregator_pb2.RESULT_OK
        elif which == "gen_aggregated_proof_request":
            r = msg.gen_aggregated_proof_request
            rid = self.prover.submit_request(ProverRequest(
                RequestType.GEN_AGGREGATED_PROOF,
                {"proof1": json.loads(r.recursive_proof_1),
                 "proof2": json.loads(r.recursive_proof_2)},
            ))
            out.gen_aggregated_proof_response.id = rid
            out.gen_aggregated_proof_response.result = \
                aggregator_pb2.RESULT_OK
        elif which == "gen_final_proof_request":
            r = msg.gen_final_proof_request
            rid = self.prover.submit_request(ProverRequest(
                RequestType.GEN_FINAL_PROOF,
                {"proof": json.loads(r.recursive_proof)},
            ))
            out.gen_final_proof_response.id = rid
            out.gen_final_proof_response.result = aggregator_pb2.RESULT_OK
        elif which == "cancel_request":
            ok = self.prover.cancel(msg.cancel_request.id)
            out.cancel_response.result = (
                aggregator_pb2.RESULT_OK if ok else aggregator_pb2.RESULT_ERROR
            )
        elif which == "get_proof_request":
            req = self.prover.wait_for_request(
                msg.get_proof_request.id,
                timeout=msg.get_proof_request.timeout or None,
            )
            if req is None:
                out.get_proof_response.result = \
                    aggregator_pb2.GetProofResponse.RESULT_ERROR
            elif not req.done.is_set():
                out.get_proof_response.result = \
                    aggregator_pb2.GetProofResponse.RESULT_PENDING
            elif req.error:
                out.get_proof_response.result = \
                    aggregator_pb2.GetProofResponse.RESULT_COMPLETED_ERROR
                out.get_proof_response.result_string = req.error
            else:
                out.get_proof_response.result = \
                    aggregator_pb2.GetProofResponse.RESULT_COMPLETED_OK
                out.get_proof_response.recursive_proof = json.dumps(
                    req.result
                )
            out.get_proof_response.id = msg.get_proof_request.id
        return out


class AggregatorTestServer:
    """Localhost aggregator driving the full e2e proof chain."""

    def __init__(self, port: int = 0):
        self.port = port
        self.server: Optional[grpc.Server] = None
        self.results: "queue.Queue" = queue.Queue()

    def _channel(self, request_iterator, context):
        def ask(msg) -> "aggregator_pb2.ProverMessage":
            msg.id = str(uuid_mod.uuid4())
            yield_q.put(msg)
            return next(request_iterator)

        yield_q: "queue.Queue" = queue.Queue()

        def driver():
            try:
                # status
                m = aggregator_pb2.AggregatorMessage()
                m.get_status_request.SetInParent()
                st = ask(m)
                # two batch proofs
                proofs: List[str] = []
                for k in range(2):
                    m = aggregator_pb2.AggregatorMessage()
                    m.gen_batch_proof_request.input.public_inputs.\
                        old_batch_num = k
                    r = ask(m)
                    rid = r.gen_batch_proof_response.id
                    m = aggregator_pb2.AggregatorMessage()
                    m.get_proof_request.id = rid
                    m.get_proof_request.timeout = 600
                    r = ask(m)
                    proofs.append(r.get_proof_response.recursive_proof)
                # aggregate
                m = aggregator_pb2.AggregatorMessage()
                m.gen_aggregated_proof_request.recursive_proof_1 = proofs[0]
                m.gen_aggregated_proof_request.recursive_proof_2 = proofs[1]
                r = ask(m)
                rid = r.gen_aggregated_proof_response.id
                m = aggregator_pb2.AggregatorMessage()
                m.get_proof_request.id = rid
                m.get_proof_request.timeout = 600
                r = ask(m)
                agg = r.get_proof_response.recursive_proof
                # final
                m = aggregator_pb2.AggregatorMessage()
                m.gen_final_proof_request.recursive_proof = agg
                r = ask(m)
                rid = r.gen_final_proof_response.id
                m = aggregator_pb2.AggregatorMessage()
                m.get_proof_request.id = rid
                m.get_proof_request.timeout = 600
                r = ask(m)
                self.results.put(r.get_proof_response.recursive_proof)
            except Exception as e:  # noqa: BLE001
                self.results.put(e)
            finally:
                yield_q.put(None)

        t = threading.Thread(target=driver, daemon=True)
        t.start()
        while True:
            msg = yield_q.get()
            if msg is None:
                return
            yield msg

    def start(self) -> int:
        handler = grpc.stream_stream_rpc_method_handler(
            self._channel,
            request_deserializer=aggregator_pb2.ProverMessage.FromString,
            response_serializer=lambda m: m.SerializeToString(),
        )
        self.server = grpc.server(futures.ThreadPoolExecutor(max_workers=8))
        self.server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(
                _SERVICE, {"Channel": handler}),)
        )
        self.port = self.server.add_insecure_port(f"127.0.0.1:{self.port}")
        self.server.start()
        return self.port

    def stop(self):
        if self.server:
            self.server.stop(grace=1)

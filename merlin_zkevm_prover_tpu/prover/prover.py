"""Prover orchestration (reference src/prover/prover.cpp).

Request queue + worker thread + cleaner thread driving the proof chain:
genBatchProof -> genAggregatedProof -> genFinalProof, plus the
processBatch latency path.  Proving is delegated to a pluggable backend
so circuits (smoke, imported-PIL zkEVM) swap without touching the
orchestration; aggregation consistency checks mirror prover.cpp:672-710.

The recursion *compression* circuits (the reference's circom verifier ->
c12a -> recursive1/2/F chain, prover.cpp:394-949) are scheduled framework
work; aggregation currently emits a checked composite proof and the final
stage wraps with Groth16 when a proving key is configured.
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List, Optional

from ..utils.config import Config
from ..utils.timer import TimerLog
from ..utils.watchdog import Watchdog
from ..utils.zklog import zklog


class RequestType(Enum):
    GEN_BATCH_PROOF = "genBatchProof"
    GEN_AGGREGATED_PROOF = "genAggregatedProof"
    GEN_FINAL_PROOF = "genFinalProof"
    PROCESS_BATCH = "processBatch"
    EXECUTE = "execute"


class RequestStatus(Enum):
    PENDING = "pending"
    COMPUTING = "computing"
    COMPLETED_OK = "completed_ok"
    COMPLETED_ERROR = "completed_error"
    CANCELLED = "cancelled"


@dataclass
class ProverRequest:
    req_type: RequestType
    input_data: dict
    uuid: str = field(default_factory=lambda: str(uuid.uuid4()))
    status: RequestStatus = RequestStatus.PENDING
    result: Optional[dict] = None
    error: str = ""
    created: float = field(default_factory=time.time)
    completed: float = 0.0
    done: threading.Event = field(default_factory=threading.Event)


class ProvingBackend:
    """Interface the orchestration drives; implementations own circuits."""

    def gen_batch_proof(self, input_data: dict) -> dict:
        raise NotImplementedError

    def gen_aggregated_proof(self, proof1: dict, proof2: dict) -> dict:
        raise NotImplementedError

    def gen_final_proof(self, proof: dict) -> dict:
        raise NotImplementedError

    def process_batch(self, input_data: dict) -> dict:
        raise NotImplementedError


class Prover:
    def __init__(self, config: Config, backend: ProvingBackend):
        self.config = config
        self.backend = backend
        self.requests: Dict[str, ProverRequest] = {}
        self._queue: "queue.Queue[ProverRequest]" = queue.Queue()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self.current: Optional[ProverRequest] = None
        self.last_computed: Optional[ProverRequest] = None
        self._worker = threading.Thread(target=self._worker_loop, daemon=True)
        self._cleaner = threading.Thread(target=self._cleaner_loop,
                                         daemon=True)
        self._worker.start()
        self._cleaner.start()

    # ------------------------------------------------------------------
    def submit_request(self, req: ProverRequest) -> str:
        with self._lock:
            self.requests[req.uuid] = req
        self._queue.put(req)
        return req.uuid

    def wait_for_request(self, req_uuid: str,
                         timeout: Optional[float] = None
                         ) -> Optional[ProverRequest]:
        with self._lock:
            req = self.requests.get(req_uuid)
        if req is None:
            return None
        req.done.wait(timeout)
        return req

    def cancel(self, req_uuid: str) -> bool:
        with self._lock:
            req = self.requests.get(req_uuid)
        if req is None or req.status != RequestStatus.PENDING:
            return False
        req.status = RequestStatus.CANCELLED
        req.done.set()
        return True

    def status(self) -> dict:
        with self._lock:
            pending = [r.uuid for r in self.requests.values()
                       if r.status == RequestStatus.PENDING]
        return {
            "status": "computing" if self.current else "idle",
            "current": self.current.uuid if self.current else "",
            "currentComputingRequestId":
                self.current.uuid if self.current else "",
            "currentComputingStartTime": int(self.current.created)
            if self.current else 0,
            "lastComputed": self.last_computed.uuid
            if self.last_computed else "",
            "lastComputedRequestId": self.last_computed.uuid
            if self.last_computed else "",
            "lastComputedEndTime": int(self.last_computed.completed)
            if self.last_computed else 0,
            "pending": pending,
            "pendingRequestQueueIds": pending,
            "proverName": self.config.proverName,
            "proverID": self.config.proverID,
            "forkID": getattr(self.config, "forkID", 5),
        }

    def shutdown(self):
        self._stop.set()

    # ------------------------------------------------------------------
    def _worker_loop(self):
        while not self._stop.is_set():
            try:
                req = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            if req.status == RequestStatus.CANCELLED:
                continue
            self.current = req
            req.status = RequestStatus.COMPUTING
            tlog = TimerLog(req.req_type.value, quiet=True)
            wd = Watchdog(self.config.aggregatorClientWatchdogTimeout)
            wd.start()
            try:
                with tlog.span(req.req_type.value.upper()):
                    req.result = self._dispatch(req)
                req.status = RequestStatus.COMPLETED_OK
            except Exception as e:  # noqa: BLE001 — error becomes response
                zklog.error(f"Prover request {req.uuid} failed: {e}")
                req.status = RequestStatus.COMPLETED_ERROR
                req.error = str(e)
            finally:
                wd.stop()
                req.completed = time.time()
                self.last_computed = req
                self.current = None
                req.done.set()

    def _dispatch(self, req: ProverRequest) -> dict:
        t = req.req_type
        if t == RequestType.GEN_BATCH_PROOF:
            return self.backend.gen_batch_proof(req.input_data)
        if t == RequestType.GEN_AGGREGATED_PROOF:
            p1 = req.input_data["proof1"]
            p2 = req.input_data["proof2"]
            self._check_aggregation(p1, p2)
            return self.backend.gen_aggregated_proof(p1, p2)
        if t == RequestType.GEN_FINAL_PROOF:
            return self.backend.gen_final_proof(req.input_data["proof"])
        if t == RequestType.PROCESS_BATCH:
            return self.backend.process_batch(req.input_data)
        raise ValueError(f"unknown request type {t}")

    @staticmethod
    def _check_aggregation(p1: dict, p2: dict):
        """Consistency of chained publics (reference prover.cpp:672-710)."""
        pub1 = p1.get("publics", {})
        pub2 = p2.get("publics", {})
        for k1, k2, name in (
            ("newStateRoot", "oldStateRoot", "state root"),
            ("newAccInputHash", "oldAccInputHash", "acc input hash"),
            ("newBatchNum", "oldBatchNum", "batch number"),
        ):
            if k1 in pub1 and k2 in pub2 and pub1[k1] != pub2[k2]:
                raise ValueError(
                    f"aggregation mismatch: {name} {pub1[k1]} != {pub2[k2]}"
                )
        for k in ("chainID", "forkID"):
            if k in pub1 and k in pub2 and pub1[k] != pub2[k]:
                raise ValueError(f"aggregation mismatch: {k}")

    def _cleaner_loop(self):
        while not self._stop.is_set():
            time.sleep(1.0)
            cutoff = time.time() - self.config.requestsPersistence
            with self._lock:
                drop = [
                    u for u, r in self.requests.items()
                    if r.done.is_set() and r.completed
                    and r.completed < cutoff
                ]
                for u in drop:
                    del self.requests[u]

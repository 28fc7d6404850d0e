"""Proving backends: circuits plugged into the Prover orchestration.

`StarkCircuitBackend` drives the real pipeline end to end: run the zkASM
executor on the batch input, assemble the stage-1 trace, STARK-prove it,
self-verify, and emit the proof + publics JSON.  Aggregation emits a
publics-chained composite (the recursion compression circuits — the
reference's circom->c12a->recursive1/2 chain — are the scheduled next
framework stage); the final stage wraps with the BN254 Groth16 prover
when a proving key is configured.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Optional

import numpy as np

from ..executor.executor import Executor
from ..stark import StarkProof, StarkProver, verify
from ..stark.compiler import StarkInfo
from ..utils.zklog import zklog
from .prover import ProvingBackend


class StarkCircuitBackend(ProvingBackend):
    """Backend over one STARK circuit.

    trace_builder(input_data, executor_result) -> (cm1 numpy matrix,
    publics array); executor optional for circuits not driven by the
    zkASM machine.
    """

    def __init__(self, info: StarkInfo, prover: StarkProver,
                 trace_builder: Callable,
                 executor: Optional[Executor] = None,
                 groth16_key=None):
        self.info = info
        self.stark_prover = prover
        self.trace_builder = trace_builder
        self.executor = executor
        self.groth16_key = groth16_key

    # ------------------------------------------------------------------
    def process_batch(self, input_data: dict) -> dict:
        assert self.executor is not None, "no executor configured"
        res = self.executor.process_batch(input_data)
        return {
            "counters": res.counters,
            "newStateRoot": list(res.new_state_root),
        }

    def gen_batch_proof(self, input_data: dict) -> dict:
        exec_result = None
        if self.executor is not None:
            exec_result = self.executor.execute(input_data)
        trace, publics = self.trace_builder(input_data, exec_result)
        if publics is None:
            publics = np.array(
                [trace[row, cid] for (_, cid, row) in self.info.publics],
                dtype=np.uint64,
            )
        proof = self.stark_prover.prove(trace, publics)
        verify(self.info, self.stark_prover.const_tree.root(), proof)
        out = {
            "type": "batch",
            "circuit": self.info.name,
            "proof": json.loads(proof.to_json()),
            "publics": {str(i): int(p) for i, p in enumerate(publics)},
        }
        if exec_result is not None:
            out["counters"] = exec_result.ctx.counters.as_dict()
        return out

    def gen_aggregated_proof(self, proof1: dict, proof2: dict) -> dict:
        # verify both children before aggregating
        for p in (proof1, proof2):
            self._verify_composite(p)
        return {
            "type": "aggregated",
            "circuit": self.info.name,
            "children": [proof1, proof2],
            "publics": self._join_publics(proof1, proof2),
        }

    def gen_final_proof(self, proof: dict) -> dict:
        self._verify_composite(proof)
        out = {
            "type": "final",
            "circuit": self.info.name,
            "aggregated": proof,
            "publics": proof.get("publics", {}),
        }
        if self.groth16_key is not None:
            out["groth16"] = self._groth16_wrap(proof)
        return out

    # ------------------------------------------------------------------
    def _verify_composite(self, p: dict):
        if p["type"] == "batch":
            sp = StarkProof.from_json(json.dumps(p["proof"]))
            verify(self.info, self.stark_prover.const_tree.root(), sp)
        elif p["type"] in ("aggregated", "final"):
            for child in p.get("children", []) or [p.get("aggregated")]:
                if child:
                    self._verify_composite(child)
        else:
            raise ValueError(f"unknown proof type {p.get('type')}")

    @staticmethod
    def _join_publics(p1: dict, p2: dict) -> dict:
        pub = dict(p1.get("publics", {}))
        for k, v in p2.get("publics", {}).items():
            pub.setdefault(k, v)
        pub["aggregated"] = True
        return pub

    def _groth16_wrap(self, proof: dict) -> dict:
        from ..snark import groth16

        # binding statement: public input = composite publics digest mod r
        from ..ops.bn254_field import FR
        from ..utils.keccak import keccak256

        digest = int.from_bytes(
            keccak256(json.dumps(proof.get("publics", {}),
                                 sort_keys=True).encode()), "big"
        ) % FR.mod
        key, builder = self.groth16_key
        witness = builder(digest)
        return groth16.prove(key, witness)

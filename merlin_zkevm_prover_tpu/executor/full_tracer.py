"""FullTracer: application-level EVM traces from ROM event hooks.

The reference full_tracer.cpp (2,408 LoC) receives `eventLog` command
callbacks embedded in the ROM (cmdBefore/cmdAfter functionCall entries)
and assembles RPC-style block/tx/opcode traces.  Same hook surface here:
the command evaluator routes eventLog/storeLog to the Context's tracer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class TxTraceEntry:
    opcode: str = ""
    gas: int = 0
    gas_cost: int = 0
    depth: int = 0
    pc: int = 0
    stack: List[int] = field(default_factory=list)
    memory_size: int = 0


@dataclass
class TxTrace:
    tx_hash: str = ""
    gas_used: int = 0
    from_addr: int = 0
    to_addr: int = 0
    logs: List[dict] = field(default_factory=list)
    steps: List[TxTraceEntry] = field(default_factory=list)
    error: str = ""


@dataclass
class BlockTrace:
    old_state_root: int = 0
    new_state_root: int = 0
    txs: List[TxTrace] = field(default_factory=list)
    events: List[dict] = field(default_factory=list)


class FullTracer:
    def __init__(self):
        self.trace = BlockTrace()
        self.current_tx: Optional[TxTrace] = None

    # -- eventLog dispatch (reference FullTracer::handleEvent) --
    def handle_event(self, name: str, ctx, params: List[int]) -> None:
        self.trace.events.append({"event": name, "params": params})
        if name == "onProcessTx":
            self.current_tx = TxTrace()
            self.trace.txs.append(self.current_tx)
        elif name == "onFinishTx" and self.current_tx is not None:
            self.current_tx.gas_used = params[0] if params else 0
            self.current_tx = None
        elif name == "onError" and self.current_tx is not None:
            self.current_tx.error = str(params[0]) if params else "error"
        elif name == "onStartBlock":
            from .main_executor import sr8to4

            self.trace.old_state_root = sum(
                int(v) << (64 * i) for i, v in enumerate(sr8to4(ctx.SR))
            )
        elif name == "onFinishBlock":
            from .main_executor import sr8to4

            self.trace.new_state_root = sum(
                int(v) << (64 * i) for i, v in enumerate(sr8to4(ctx.SR))
            )
        elif name == "onOpcode" and self.current_tx is not None:
            self.current_tx.steps.append(TxTraceEntry(
                pc=ctx.PC, gas=ctx.GAS, depth=ctx.CTX,
            ))

    def handle_store_log(self, ctx, params: List[int]) -> None:
        if self.current_tx is not None:
            self.current_tx.logs.append({"data": params})
        self.trace.events.append({"event": "storeLog", "params": params})

    def result(self) -> BlockTrace:
        return self.trace

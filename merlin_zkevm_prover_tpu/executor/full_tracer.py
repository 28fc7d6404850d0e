"""FullTracer: RPC-grade EVM traces from ROM event hooks (reference
src/main_sm/fork_5/main/full_tracer.cpp, 2,408 LoC).

The ROM embeds `eventLog(...)` commands (cmdBefore/cmdAfter); the command
evaluator routes them here.  Events mirrored from the reference dispatch
(full_tracer.cpp:315-353): onStartBatch, onProcessTx, onFinishTx, onError,
onOpcode, onUpdateStorage, plus storeLog for LOG0..LOG4 assembly.

Context values are read the way the reference reads them: registers for
gas/pc, and the ROM's named memory slots (offsetLabel map) for per-tx
fields (txDestAddr, txSrcOriginAddr, txGasLimit, txValue, ...).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

# EVM opcode names for the trace (index = opcode byte)
_OPCODES: Dict[int, str] = {
    0x00: "STOP", 0x01: "ADD", 0x02: "MUL", 0x03: "SUB", 0x04: "DIV",
    0x05: "SDIV", 0x06: "MOD", 0x07: "SMOD", 0x08: "ADDMOD",
    0x09: "MULMOD", 0x0A: "EXP", 0x0B: "SIGNEXTEND", 0x10: "LT",
    0x11: "GT", 0x12: "SLT", 0x13: "SGT", 0x14: "EQ", 0x15: "ISZERO",
    0x16: "AND", 0x17: "OR", 0x18: "XOR", 0x19: "NOT", 0x1A: "BYTE",
    0x1B: "SHL", 0x1C: "SHR", 0x1D: "SAR", 0x20: "SHA3", 0x30: "ADDRESS",
    0x31: "BALANCE", 0x32: "ORIGIN", 0x33: "CALLER", 0x34: "CALLVALUE",
    0x35: "CALLDATALOAD", 0x36: "CALLDATASIZE", 0x37: "CALLDATACOPY",
    0x38: "CODESIZE", 0x39: "CODECOPY", 0x3A: "GASPRICE",
    0x3B: "EXTCODESIZE", 0x3C: "EXTCODECOPY", 0x3D: "RETURNDATASIZE",
    0x3E: "RETURNDATACOPY", 0x3F: "EXTCODEHASH", 0x40: "BLOCKHASH",
    0x41: "COINBASE", 0x42: "TIMESTAMP", 0x43: "NUMBER",
    0x44: "DIFFICULTY", 0x45: "GASLIMIT", 0x46: "CHAINID",
    0x47: "SELFBALANCE", 0x50: "POP", 0x51: "MLOAD", 0x52: "MSTORE",
    0x53: "MSTORE8", 0x54: "SLOAD", 0x55: "SSTORE", 0x56: "JUMP",
    0x57: "JUMPI", 0x58: "PC", 0x59: "MSIZE", 0x5A: "GAS",
    0x5B: "JUMPDEST", 0xF0: "CREATE", 0xF1: "CALL", 0xF2: "CALLCODE",
    0xF3: "RETURN", 0xF4: "DELEGATECALL", 0xF5: "CREATE2",
    0xFA: "STATICCALL", 0xFD: "REVERT", 0xFE: "INVALID",
    0xFF: "SELFDESTRUCT",
}
for _i in range(32):
    _OPCODES[0x60 + _i] = f"PUSH{_i + 1}"
for _i in range(16):
    _OPCODES[0x80 + _i] = f"DUP{_i + 1}"
    _OPCODES[0x90 + _i] = f"SWAP{_i + 1}"
for _i in range(5):
    _OPCODES[0xA0 + _i] = f"LOG{_i}"


@dataclass
class OpcodeEntry:
    opcode: str = ""
    op: int = 0
    pc: int = 0
    gas: int = 0
    gas_cost: int = 0
    depth: int = 1
    state_root: int = 0


@dataclass
class LogEntry:
    address: int = 0
    topics: List[int] = field(default_factory=list)
    data: List[int] = field(default_factory=list)
    index: int = 0


@dataclass
class TxTrace:
    nonce: int = 0
    from_addr: int = 0
    to_addr: int = 0
    gas_limit: int = 0
    gas_used: int = 0
    value: int = 0
    state_root: int = 0
    status: int = 1
    error: str = ""
    logs: List[LogEntry] = field(default_factory=list)
    storage_updates: List[dict] = field(default_factory=list)
    steps: List[OpcodeEntry] = field(default_factory=list)


@dataclass
class BatchTrace:
    old_state_root: int = 0
    new_state_root: int = 0
    gas_used: int = 0
    txs: List[TxTrace] = field(default_factory=list)
    events: List[dict] = field(default_factory=list)
    error: str = ""


def _fea(limbs) -> int:
    return sum((int(v) & 0xFFFFFFFF) << (32 * i) for i, v in enumerate(limbs))


class FullTracer:
    def __init__(self, record_opcodes: bool = True):
        self.trace = BatchTrace()
        self.current_tx: Optional[TxTrace] = None
        self.record_opcodes = record_opcodes
        self._labels: Optional[Dict[str, int]] = None
        self._prev_gas: Optional[int] = None

    # ------------------------------------------------------------------
    def _mem_label(self, ctx, label: str, default: int = 0) -> int:
        """Read a ROM-named global memory slot (reference reads e.g.
        ctx.mem[txDestAddr] in onProcessTx)."""
        if self._labels is None:
            self._labels = {}
            for line in ctx.rom.lines:
                if line.offset_label and line.offset_label not in self._labels:
                    if not line.flag("useCTX") and not line.flag("isStack") \
                            and not line.flag("isMem"):
                        self._labels[line.offset_label] = line.offset
        off = self._labels.get(label)
        if off is None:
            return default
        return _fea(ctx.mem.get(off, [0] * 8))

    def _ctx_label(self, ctx, label: str, default: int = 0) -> int:
        """Read a per-context (useCTX) memory slot."""
        if self._labels is None:
            self._mem_label(ctx, "", default)
        for line in ctx.rom.lines:
            if line.offset_label == label and line.flag("useCTX"):
                off = line.offset + ctx.CTX * 0x40000
                return _fea(ctx.mem.get(off, [0] * 8))
        return default

    # -- eventLog dispatch (reference FullTracer::handleEvent :315-353) --
    def handle_event(self, name: str, ctx, params: List[int]) -> None:
        self.trace.events.append({"event": name, "step": ctx.counters.steps})
        if name == "onStartBatch":
            from .main_executor import sr8to4

            self.trace.old_state_root = _fea(ctx.SR)
        elif name == "onFinishBatch":
            self.trace.new_state_root = _fea(ctx.SR)
        elif name == "onProcessTx":
            tx = TxTrace()
            tx.from_addr = self._ctx_label(ctx, "txSrcOriginAddr")
            tx.to_addr = self._ctx_label(ctx, "txDestAddr")
            tx.gas_limit = self._ctx_label(ctx, "txGasLimit")
            tx.value = self._ctx_label(ctx, "txValue")
            tx.nonce = self._ctx_label(ctx, "txNonce")
            self.current_tx = tx
            self.trace.txs.append(tx)
            self._prev_gas = None
        elif name == "onFinishTx":
            if self.current_tx is not None:
                tx = self.current_tx
                if tx.gas_limit:
                    tx.gas_used = tx.gas_limit - ctx.GAS
                elif params:
                    tx.gas_used = int(params[0])
                tx.state_root = _fea(ctx.SR)
                self.trace.gas_used += tx.gas_used
                self.current_tx = None
        elif name == "onError":
            err = str(params[0]) if params else "error"
            if self.current_tx is not None:
                self.current_tx.error = err
                self.current_tx.status = 0
            else:
                self.trace.error = err
        elif name == "onOpcode":
            if self.current_tx is not None and self.record_opcodes:
                opn = int(params[0]) & 0xFF if params else 0
                gas = ctx.GAS if isinstance(ctx.GAS, int) else 0
                entry = OpcodeEntry(
                    opcode=_OPCODES.get(opn, f"0x{opn:02x}"),
                    op=opn, pc=ctx.PC, gas=gas,
                    depth=self._ctx_label(ctx, "depth", 1) or 1,
                    state_root=_fea(ctx.SR),
                )
                if self._prev_gas is not None and self.current_tx.steps:
                    self.current_tx.steps[-1].gas_cost = \
                        self._prev_gas - gas
                self._prev_gas = gas
                self.current_tx.steps.append(entry)
        elif name == "onUpdateStorage":
            if self.current_tx is not None:
                # reference onUpdateStorage(C: key, D: value)
                self.current_tx.storage_updates.append({
                    "key": _fea(ctx.C), "value": _fea(ctx.D),
                })

    def handle_store_log(self, ctx, params: List[int]) -> None:
        """storeLog(indexLog, isTopic, data) — assemble LOG0..4 entries."""
        if self.current_tx is None:
            return
        if len(params) < 3:
            self.trace.events.append({"event": "storeLog", "params": params})
            return
        index, is_topic, data = int(params[0]), int(params[1]), int(params[2])
        logs = self.current_tx.logs
        while len(logs) <= index:
            logs.append(LogEntry(index=len(logs)))
        entry = logs[index]
        entry.address = self._ctx_label(ctx, "storageAddr")
        if is_topic:
            entry.topics.append(data)
        else:
            entry.data.append(data)

    # ------------------------------------------------------------------
    def result(self) -> BatchTrace:
        return self.trace

    def get_transaction_trace(self, idx: int) -> Optional[TxTrace]:
        return self.trace.txs[idx] if idx < len(self.trace.txs) else None

    def receipts(self) -> List[dict]:
        """RPC-style receipt list (reference executor service response)."""
        out = []
        for i, tx in enumerate(self.trace.txs):
            out.append({
                "txIndex": i,
                "from": hex(tx.from_addr),
                "to": hex(tx.to_addr),
                "gasUsed": tx.gas_used,
                "status": tx.status,
                "error": tx.error,
                "stateRoot": hex(tx.state_root),
                "logs": [
                    {"address": hex(l.address),
                     "topics": [hex(t) for t in l.topics],
                     "data": [hex(d) for d in l.data]}
                    for l in tx.logs
                ],
            })
        return out

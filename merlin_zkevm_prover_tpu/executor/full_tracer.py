"""FullTracer: RPC-grade EVM traces from ROM event hooks (reference
src/main_sm/fork_5/main/full_tracer.cpp, 2,408 LoC).

The ROM embeds `eventLog(...)` commands (cmdBefore/cmdAfter); the command
evaluator routes them here.  Events mirrored from the reference dispatch
(full_tracer.cpp:297-353): onStartBatch, onFinishBatch, onProcessTx,
onFinishTx, onError, onOpcode, onUpdateStorage, plus storeLog for
LOG0..LOG4 assembly.

Per-opcode capture mirrors onOpcode (full_tracer.cpp:1738-2345):
  * call depth from CTX variation (prevCTX vs CTX, :1748-1757);
  * pc/gas/state-root from registers; gasRefund from the ROM var;
  * the previous opcode's real gas_cost from the gas delta, with the
    reference's special cases (zero-cost ops, CALL/CREATE read the origin
    context's gasCTX, :2022-2102);
  * EVM stack from the context's 0x10000 region (SP entries, :1900-1925);
  * EVM memory from the 0x20000 region sized by the memLength var,
    stored incrementally against the previous snapshot (:1822-1890);
  * return data via retDataOffset/retDataLength context vars (:2126+).

Capture is gated by TraceConfig exactly like the reference input
(traceConfig.{disableStack, disableStorage, enableMemory,
enableReturnData}; full/call trace generation flags).
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

# static intrinsic gas per opcode (reference opcodeInfo[].gas; the real
# cost of dynamic opcodes is fixed up from the gas delta at the NEXT
# opcode, full_tracer.cpp:2022-2102)
_STATIC_GAS: Dict[int, int] = {}
for _op in list(range(0x01, 0x0C)) + list(range(0x10, 0x1E)):
    _STATIC_GAS[_op] = 3
for _op in (0x02, 0x04, 0x05, 0x06, 0x07):
    _STATIC_GAS[_op] = 5
_STATIC_GAS.update({0x08: 8, 0x09: 8, 0x0A: 10, 0x20: 30, 0x31: 100,
                    0x3B: 100, 0x3C: 100, 0x3F: 100, 0x54: 100,
                    0x55: 100, 0xF0: 32000, 0xF5: 32000, 0x00: 0,
                    0x5B: 1, 0x50: 2, 0x58: 2, 0x59: 2, 0x5A: 2,
                    0x56: 8, 0x57: 10, 0xF3: 0, 0xFD: 0, 0xFE: 0})
for _op in range(0x60, 0xA0):
    _STATIC_GAS[_op] = 3
for _i in range(5):
    _STATIC_GAS[0xA0 + _i] = 375 * (_i + 1)

# reference zeroCostOp / opCall / opCreate sets (full_tracer.cpp)
_ZERO_COST = {"STOP", "REVERT", "RETURN"}
_OP_CALL = {"CALL", "CALLCODE", "DELEGATECALL", "STATICCALL"}
_OP_CREATE = {"CREATE", "CREATE2"}

_CTX_STRIDE = 0x40000
_STACK_BASE = 0x10000
_MEM_BASE = 0x20000


@dataclass
class TraceConfig:
    """Reference input.traceConfig (input.hpp): RPC debug_trace flags."""
    enabled: bool = False
    disable_stack: bool = False
    disable_storage: bool = False
    enable_memory: bool = False
    enable_return_data: bool = False
    generate_call_trace: bool = True
    generate_execute_trace: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "TraceConfig":
        return cls(
            enabled=bool(d.get("enabled", False)),
            disable_stack=bool(d.get("disableStack", False)),
            disable_storage=bool(d.get("disableStorage", False)),
            enable_memory=bool(d.get("enableMemory", False)),
            enable_return_data=bool(d.get("enableReturnData", False)),
            generate_call_trace=bool(d.get("generateCallTrace", True)),
            generate_execute_trace=bool(d.get("generateExecuteTrace", True)),
        )


@dataclass
class OpcodeEntry:
    opcode: str = ""
    op: int = 0
    pc: int = 0
    gas: int = 0
    gas_cost: int = 0
    gas_refund: int = 0
    depth: int = 1
    state_root: int = 0
    error: str = ""
    stack: Optional[List[int]] = None
    memory: Optional[bytes] = None          # incremental content
    memory_offset: int = 0
    memory_size: int = 0
    return_data: Optional[bytes] = None
    storage: Optional[Dict[int, int]] = None  # per-context snapshot


@dataclass
class LogEntry:
    address: int = 0
    topics: List[int] = field(default_factory=list)
    data: List[int] = field(default_factory=list)
    index: int = 0


@dataclass
class CallContext:
    """response.call_trace.context (reference Response struct)."""
    from_addr: int = 0
    to_addr: int = 0
    type: str = "CALL"
    data: bytes = b""
    gas: int = 0
    gas_used: int = 0
    value: int = 0
    output: bytes = b""


@dataclass
class TxTrace:
    nonce: int = 0
    from_addr: int = 0
    to_addr: int = 0
    gas_limit: int = 0
    gas_used: int = 0
    gas_refunded: int = 0
    value: int = 0
    gas_price: int = 0
    state_root: int = 0
    status: int = 1
    error: str = ""
    return_value: bytes = b""
    create_address: int = 0
    context: CallContext = field(default_factory=CallContext)
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


# SMT key types (reference smt_utils.hpp SMT_KEY_*)
_SMT_KEY_BALANCE = 0
_SMT_KEY_NONCE = 1


class FullTracer:
    def __init__(self, record_opcodes: bool = True,
                 config: Optional[TraceConfig] = None):
        self.trace = BatchTrace()
        self.current_tx: Optional[TxTrace] = None
        self.record_opcodes = record_opcodes
        self.config = config or TraceConfig()
        # touched-address balances/nonces for the executor response
        # (reference FullTracer::addReadWriteAddress, full_tracer.cpp:2347;
        # surfaced as response.read_write_addresses,
        # executor_service.cpp:342-352)
        self.read_write_addresses: Dict[str, Dict[str, str]] = {}
        self._labels: Optional[Dict[str, int]] = None
        self._ctx_labels: Optional[Dict[str, int]] = None
        # call-depth machinery (reference full_tracer.cpp:1748-1757)
        self._prev_ctx: Optional[int] = None
        self._depth: int = 1
        self._prev_memory: bytes = b""
        self._ctx_storage: Dict[int, Dict[int, int]] = {}

    # ------------------------------------------------------------------
    # ROM named-memory access (reference getVarFromCtx / rom.*Offset)
    # ------------------------------------------------------------------
    def _build_labels(self, ctx) -> None:
        self._labels = {}
        self._ctx_labels = {}
        for line in ctx.rom.lines:
            if not line.offset_label:
                continue
            if line.flag("isStack") or line.flag("isMem"):
                continue
            tgt = self._ctx_labels if line.flag("useCTX") else self._labels
            tgt.setdefault(line.offset_label, line.offset)

    def _mem_label(self, ctx, label: str, default: int = 0) -> int:
        """Read a ROM-named global memory slot."""
        if self._labels is None:
            self._build_labels(ctx)
        off = self._labels.get(label)
        if off is None:
            return default
        return _fea(ctx.mem.get(off, [0] * 8))

    def _ctx_label(self, ctx, label: str, default: int = 0,
                   ctx_num: Optional[int] = None) -> int:
        """Read a per-context (useCTX) memory slot, optionally of another
        context (reference getVarFromCtx with explicit pContext)."""
        if self._labels is None:
            self._build_labels(ctx)
        off = self._ctx_labels.get(label)
        if off is None:
            return default
        c = ctx.CTX if ctx_num is None else ctx_num
        return _fea(ctx.mem.get(off + c * _CTX_STRIDE, [0] * 8))

    def _read_ctx_memory(self, ctx, offset: int, length: int,
                         ctx_num: Optional[int] = None) -> bytes:
        """Byte-addressed read of a context's EVM memory region
        (reference getFromMemory, full_tracer.cpp helper)."""
        if length <= 0:
            return b""
        c = ctx.CTX if ctx_num is None else ctx_num
        base = c * _CTX_STRIDE + _MEM_BASE
        out = bytearray()
        first_word = offset // 32
        last_word = (offset + length - 1) // 32
        for w in range(first_word, last_word + 1):
            v = _fea(ctx.mem.get(base + w, [0] * 8))
            out += int(v).to_bytes(32, "big")
        start = offset % 32
        return bytes(out[start:start + length])

    # ------------------------------------------------------------------
    # per-opcode capture (reference onOpcode, full_tracer.cpp:1738-2345)
    # ------------------------------------------------------------------
    def _capture_stack(self, ctx) -> List[int]:
        base = ctx.CTX * _CTX_STRIDE + _STACK_BASE
        return [
            _fea(ctx.mem.get(base + i, [0] * 8)) for i in range(int(ctx.SP))
        ]

    def _capture_memory(self, ctx, entry: OpcodeEntry) -> None:
        mem_len_words = -(-self._ctx_label(ctx, "memLength") // 32)
        base = ctx.CTX * _CTX_STRIDE + _MEM_BASE
        buf = bytearray()
        for w in range(mem_len_words):
            buf += int(_fea(ctx.mem.get(base + w, [0] * 8))).to_bytes(32, "big")
        snapshot = bytes(buf)
        if not self.current_tx.steps:
            entry.memory_offset = 0
            entry.memory = snapshot
        elif snapshot != self._prev_memory:
            # incremental diff (reference getStringIncrement)
            prev = self._prev_memory
            lo = 0
            n = min(len(prev), len(snapshot))
            while lo < n and prev[lo] == snapshot[lo]:
                lo += 1
            hi = len(snapshot)
            entry.memory_offset = lo
            entry.memory = snapshot[lo:hi]
        self._prev_memory = snapshot
        entry.memory_size = len(snapshot)

    def _fix_prev_gas_cost(self, ctx, cur: OpcodeEntry) -> None:
        """Reference full_tracer.cpp:2022-2102: the real gas cost of the
        previous opcode is its gas minus the current gas, except zero-cost
        ops and CALL/CREATE, which span contexts (use the origin CTX's
        gasCTX var)."""
        steps = self.current_tx.steps
        if not steps:
            return
        prev = steps[-1]
        gas_cost = prev.gas - cur.gas
        if prev.opcode in _ZERO_COST:
            prev.gas_cost = 0
        elif prev.opcode in _OP_CREATE:
            if prev.error:
                gas_call = self._ctx_label(ctx, "gasCall")
                prev.gas_cost = gas_cost - gas_call + cur.gas
            else:
                origin_ctx = self._ctx_label(ctx, "originCTX")
                gas_ctx = self._ctx_label(ctx, "gasCTX",
                                          ctx_num=origin_ctx)
                prev.gas_cost = gas_cost - gas_ctx
        elif prev.opcode in _OP_CALL and prev.depth != cur.depth:
            origin_ctx = self._ctx_label(ctx, "originCTX")
            gas_ctx = self._ctx_label(ctx, "gasCTX", ctx_num=origin_ctx)
            prev.gas_cost = prev.gas - gas_ctx
        else:
            prev.gas_cost = gas_cost
        # SSTORE refund surfaced on the previous opcode (:2106-2122)
        gas_refund = self._ctx_label(ctx, "gasRefund")
        if gas_refund > 0:
            cur.gas_refund = gas_refund
            if prev.op == 0x55:
                prev.gas_refund = gas_refund

    def _on_opcode(self, ctx, params: List[int]) -> None:
        # depth from CTX variation (reference :1748-1757)
        cur_ctx = int(ctx.CTX)
        if self._prev_ctx is not None:
            if self._prev_ctx > cur_ctx:
                self._depth -= 1
            elif self._prev_ctx < cur_ctx:
                self._depth += 1
        self._prev_ctx = cur_ctx

        opn = int(params[0]) & 0xFF if params else 0
        gas = int(ctx.GAS) if isinstance(ctx.GAS, int) else 0
        entry = OpcodeEntry(
            opcode=_OPCODES.get(opn, f"0x{opn:02x}"),
            op=opn, pc=int(ctx.PC), gas=gas,
            gas_cost=_STATIC_GAS.get(opn, 0),
            gas_refund=self._ctx_label(ctx, "gasRefund"),
            depth=max(self._depth, 1),
            state_root=_fea(ctx.SR),
        )
        cfg = self.config
        if not cfg.disable_stack:
            entry.stack = self._capture_stack(ctx)
        if cfg.enable_memory:
            self._capture_memory(ctx, entry)
        if not cfg.disable_storage and opn in (0x54, 0x55):  # SLOAD/SSTORE
            entry.storage = dict(self._ctx_storage.get(cur_ctx, {}))
        if cfg.enable_return_data:
            ret_len = self._ctx_label(ctx, "retDataLength")
            if ret_len:
                ret_off = self._ctx_label(ctx, "retDataOffset")
                entry.return_data = self._read_ctx_memory(
                    ctx, ret_off, min(ret_len, 1 << 16))
        self._fix_prev_gas_cost(ctx, entry)
        self.current_tx.steps.append(entry)

    # -- eventLog dispatch (reference FullTracer::handleEvent :297-353) --
    def handle_event(self, name: str, ctx, params: List[int]) -> None:
        self.trace.events.append({"event": name, "step": ctx.counters.steps})
        if name == "onStartBatch":
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
            tx.gas_price = self._ctx_label(ctx, "txGasPrice")
            tx.context = CallContext(
                from_addr=tx.from_addr, to_addr=tx.to_addr,
                gas=tx.gas_limit, value=tx.value,
                type="CREATE" if self._ctx_label(ctx, "isCreate")
                else "CALL",
            )
            calldata_len = self._ctx_label(ctx, "txCalldataLen")
            if calldata_len:
                calldata_ctx = self._ctx_label(ctx, "calldataCTX") or ctx.CTX
                off = self._ctx_label(ctx, "calldataOffset",
                                      ctx_num=calldata_ctx)
                tx.context.data = self._read_ctx_memory(
                    ctx, off, min(calldata_len, 1 << 16),
                    ctx_num=calldata_ctx)
            self.current_tx = tx
            self.trace.txs.append(tx)
            self._prev_ctx = None
            self._depth = 1
            self._prev_memory = b""
            self._ctx_storage = {}
        elif name == "onFinishTx":
            if self.current_tx is not None:
                tx = self.current_tx
                if tx.gas_limit:
                    tx.gas_used = tx.gas_limit - ctx.GAS
                elif params:
                    tx.gas_used = int(params[0])
                tx.state_root = _fea(ctx.SR)
                # return value from the ROM's retData vars (:1212-1238)
                ret_len = self._ctx_label(ctx, "retDataLength")
                if ret_len:
                    ret_off = self._ctx_label(ctx, "retDataOffset")
                    tx.return_value = self._read_ctx_memory(
                        ctx, ret_off, min(ret_len, 1 << 16))
                    tx.context.output = tx.return_value
                # deploy: expose the created address (:1241-1251)
                if tx.to_addr == 0:
                    tx.create_address = self._ctx_label(ctx, "txDestAddr")
                tx.context.gas_used = tx.gas_used
                if tx.steps:
                    last = tx.steps[-1]
                    tx.gas_refunded = last.gas_refund
                    if len(tx.steps) > 1 and last.op != 0x00 and \
                            not last.error and tx.to_addr != 0:
                        last.gas_cost = last.gas - int(ctx.GAS)
                self.trace.gas_used += tx.gas_used
                self.current_tx = None
        elif name == "onError":
            err = str(params[0]) if params else "error"
            if self.current_tx is not None:
                self.current_tx.error = err
                self.current_tx.status = 0
                if self.current_tx.steps:
                    self.current_tx.steps[-1].error = err
            else:
                self.trace.error = err
        elif name == "onOpcode":
            if self.current_tx is not None and self.record_opcodes:
                self._on_opcode(ctx, params)
        elif name == "onUpdateStorage":
            if self.current_tx is not None:
                # reference onUpdateStorage(C: key, D: value) :1055-1110
                key, value = _fea(ctx.C), _fea(ctx.D)
                self.current_tx.storage_updates.append({
                    "key": key, "value": value,
                })
                self._ctx_storage.setdefault(int(ctx.CTX), {})[key] = value

    def add_read_write_address(self, a_regs, b_regs, value: int) -> None:
        """Record a touched address's balance/nonce from an SMT get/set
        (reference addReadWriteAddress, called at the sRD/sWR ops with
        A = address, B = SMT key type; main_executor.cpp:887,1030)."""
        key_type = _fea(b_regs)
        if key_type not in (_SMT_KEY_BALANCE, _SMT_KEY_NONCE):
            return
        addr = f"0x{_fea(a_regs) & ((1 << 160) - 1):040x}"
        entry = self.read_write_addresses.setdefault(addr, {})
        entry["balance" if key_type == _SMT_KEY_BALANCE else "nonce"] = \
            str(int(value))

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
                "gasRefunded": tx.gas_refunded,
                "effectiveGasPrice": hex(tx.gas_price),
                "status": tx.status,
                "error": tx.error,
                "stateRoot": hex(tx.state_root),
                "returnValue": tx.return_value.hex(),
                "createAddress": hex(tx.create_address)
                if tx.create_address else "",
                "logs": [
                    {"address": hex(l.address),
                     "topics": [hex(t) for t in l.topics],
                     "data": [hex(d) for d in l.data]}
                    for l in tx.logs
                ],
            })
        return out

    def full_trace(self, idx: int) -> Optional[dict]:
        """debug_traceTransaction-shaped output for tx `idx` (reference
        Response.full_trace: {context, steps})."""
        tx = self.get_transaction_trace(idx)
        if tx is None:
            return None
        c = tx.context
        return {
            "context": {
                "from": hex(c.from_addr), "to": hex(c.to_addr),
                "type": c.type, "data": c.data.hex(), "gas": c.gas,
                "gasUsed": c.gas_used, "value": c.value,
                "output": c.output.hex(),
            },
            "steps": [
                {
                    "opcode": s.opcode, "op": s.op, "pc": s.pc,
                    "gas": s.gas, "gasCost": s.gas_cost,
                    "gasRefund": s.gas_refund, "depth": s.depth,
                    "stateRoot": hex(s.state_root), "error": s.error,
                    **({"stack": [hex(v) for v in s.stack]}
                       if s.stack is not None else {}),
                    **({"memory": s.memory.hex(),
                        "memoryOffset": s.memory_offset,
                        "memorySize": s.memory_size}
                       if s.memory is not None else {}),
                    **({"returnData": s.return_data.hex()}
                       if s.return_data is not None else {}),
                    **({"storage": {hex(k): hex(v)
                                    for k, v in s.storage.items()}}
                       if s.storage is not None else {}),
                }
                for s in tx.steps
            ],
        }

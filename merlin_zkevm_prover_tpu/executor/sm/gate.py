"""Gate framework (reference src/sm/gate/: GateState, gate_state.cpp).

A gate program is a list of (op, in_a, in_b, out) over a flat wire array
with XOR and ANDP (and-not) ops — the representation the KeccakF SM
proves: each evaluated gate becomes one trace row of the gate circuit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

XOR = 0
ANDP = 1   # out = (~a) & b   (reference "andp": and-not-previous)


@dataclass
class GateProgram:
    n_wires: int = 0
    # constant wires: wire 0 = 0, wire 1 = 1 (reference ZeroRef usage)
    gates: List[Tuple[int, int, int, int]] = field(default_factory=list)
    inputs: List[int] = field(default_factory=list)    # wire ids
    outputs: List[int] = field(default_factory=list)

    def new_wire(self) -> int:
        w = self.n_wires
        self.n_wires += 1
        return w

    def xor(self, a: int, b: int) -> int:
        out = self.new_wire()
        self.gates.append((XOR, a, b, out))
        return out

    def andp(self, a: int, b: int) -> int:
        """(~a) & b."""
        out = self.new_wire()
        self.gates.append((ANDP, a, b, out))
        return out

    def xor_many(self, wires: List[int]) -> int:
        acc = wires[0]
        for w in wires[1:]:
            acc = self.xor(acc, w)
        return acc


def evaluate(prog: GateProgram, input_bits: np.ndarray) -> np.ndarray:
    """Evaluate over a batch: input_bits (n_inputs, B) uint8/bool ->
    (n_outputs, B)."""
    b = input_bits.shape[1]
    wires = np.zeros((prog.n_wires, b), dtype=np.uint8)
    wires[1, :] = 1
    for i, w in enumerate(prog.inputs):
        wires[w] = input_bits[i]
    for (op, a, bb, out) in prog.gates:
        if op == XOR:
            wires[out] = wires[a] ^ wires[bb]
        else:
            wires[out] = (1 - wires[a]) & wires[bb]
    return wires[prog.outputs]


def gate_trace_columns(prog: GateProgram, input_bits: np.ndarray,
                       n: int) -> Dict[str, np.ndarray]:
    """Per-gate trace rows (a, b, out, op) — the KeccakF SM columns."""
    if len(prog.gates) > n:
        raise ValueError(f"gate trace overflow: {len(prog.gates)} > {n}")
    b = input_bits.shape[1]
    wires = np.zeros((prog.n_wires, b), dtype=np.uint8)
    wires[1, :] = 1
    for i, w in enumerate(prog.inputs):
        wires[w] = input_bits[i]
    cols = {
        "a": np.zeros(n, dtype=np.uint64),
        "b": np.zeros(n, dtype=np.uint64),
        "c": np.zeros(n, dtype=np.uint64),
        "op": np.zeros(n, dtype=np.uint64),
    }
    for i, (op, a, bb, out) in enumerate(prog.gates):
        if op == XOR:
            wires[out] = wires[a] ^ wires[bb]
        else:
            wires[out] = (1 - wires[a]) & wires[bb]
        # pack the batch bits into one felt per row (bit k of slot k)
        cols["a"][i] = int.from_bytes(
            np.packbits(wires[a][:64], bitorder="little").tobytes(), "little")
        cols["b"][i] = int.from_bytes(
            np.packbits(wires[bb][:64], bitorder="little").tobytes(), "little")
        cols["c"][i] = int.from_bytes(
            np.packbits(wires[out][:64], bitorder="little").tobytes(), "little")
        cols["op"][i] = op
    return cols

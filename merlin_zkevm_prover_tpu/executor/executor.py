"""Executor dispatcher (reference src/executor/executor.cpp).

Fast mode (`process_batch`, reference :18-182): Main SM only, returns
counters + required actions.  Full mode (`execute`, reference :296-458):
Main SM then the secondary SMs concurrently (thread pool standing in for
the reference's 6 pthreads), producing the per-SM committed columns.
"""

from __future__ import annotations

import concurrent.futures
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from ..hashdb.hashdb import HashDB
from ..utils.timer import TimerLog
from .main_executor import Context, MainExecutor
from .rom import Rom
from .sm import (
    ArithExecutor,
    BinaryExecutor,
    MemAlignExecutor,
    MemoryExecutor,
    PoseidonGExecutor,
)
from .sm.keccak_pipeline import run_keccak_pipeline
from .sm.padding_pg import PaddingPGExecutor
from .sm.storage_executor import StorageExecutor


@dataclass
class ProcessBatchResult:
    counters: Dict[str, int]
    new_state_root: tuple
    ctx: Context


@dataclass
class ExecuteResult:
    ctx: Context
    sm_pols: Dict[str, Dict[str, np.ndarray]] = field(default_factory=dict)


class Executor:
    def __init__(self, rom: Rom, hashdb: Optional[HashDB] = None,
                 n_bits: int = 16):
        self.rom = rom
        self.hashdb = hashdb or HashDB()
        self.n = 1 << n_bits
        self.main = MainExecutor(rom, self.hashdb, max_steps=self.n)
        self.arith = ArithExecutor()
        self.binary = BinaryExecutor()
        self.memory = MemoryExecutor()
        self.mem_align = MemAlignExecutor()
        self.poseidon_g = PoseidonGExecutor()
        self.storage = StorageExecutor()
        self.padding_pg = PaddingPGExecutor()

    def process_batch(self, input_data: Optional[dict] = None
                      ) -> ProcessBatchResult:
        """Latency path: Main SM only (reference Executor::process_batch)."""
        ctx = self.main.execute(input_data)
        from .main_executor import sr8to4

        final_sr = (ctx.final_regs or {}).get("SR", ctx.SR)
        return ProcessBatchResult(
            counters=ctx.counters.as_dict(),
            new_state_root=sr8to4(final_sr),
            ctx=ctx,
        )

    def execute(self, input_data: Optional[dict] = None,
                timer: Optional[TimerLog] = None,
                record_pols: bool = True) -> ExecuteResult:
        """Full mode: Main SM + secondary SMs in parallel threads.

        With record_pols, the Main SM's 175 committed columns are filled
        (executor/main_pols.py) and returned in sm_pols["main"]."""
        tlog = timer or TimerLog("executor", quiet=True)
        with tlog.span("MAIN_EXECUTOR"):
            ctx = self.main.execute(input_data, record_trace=True,
                                    record_pols=record_pols)
        req = ctx.required
        res = ExecuteResult(ctx=ctx)
        if ctx.pols is not None:
            res.sm_pols["main"] = ctx.pols.cols
        def poseidon_all():
            # reference thread grouping PaddingPG -> Storage -> PoseidonG
            # (executor.cpp:428-449): the Storage micro-ROM and PaddingPG
            # both emit PoseidonG permutation work items
            storage_req: list = []
            res.sm_pols["storage"] = self.storage.execute(
                req.storage, self.n, required_poseidon=storage_req)
            pg_pols, pg_required = self.padding_pg.execute(
                req.padding_pg_inputs, self.n)
            res.sm_pols["paddingPG"] = pg_pols
            return self.poseidon_g.execute(
                req.poseidon_g + storage_req + pg_required, self.n)

        def keccak_all():
            # one keccak-f slot = ~155k gate rows (reference
            # keccak_config.hpp:21-28); at reduced domains size the gate
            # region independently so small-N test runs still fit
            from .sm.keccak_f_script import build_keccak_f_program

            n_gates = len(build_keccak_f_program().gates)
            n_blocks = sum(
                (len(data) + 136) // 136 for data in req.keccak_inputs
            )
            n_slots = -(-max(n_blocks, 1) // 44)
            need = 1 + n_slots * n_gates
            nk = max(self.n, 1 << (need - 1).bit_length())
            out = run_keccak_pipeline(req.keccak_inputs, nk)
            res.sm_pols["paddingKK"] = out["paddingKK"]
            res.sm_pols["paddingKKBit"] = out["paddingKKBit"]
            res.sm_pols["bits2field"] = out["bits2field"]
            return out["keccakF"]

        jobs = {
            "arith": lambda: self.arith.execute(req.arith, self.n),
            "binary": lambda: self.binary.execute(req.binary, self.n),
            "memory": lambda: self.memory.execute(req.memory, self.n),
            "memAlign": lambda: self.mem_align.execute(req.mem_align, self.n),
            "keccakF": keccak_all,
            "poseidonG": poseidon_all,
        }
        with tlog.span("SECONDARY_SMS"):
            with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
                futures = {name: ex.submit(fn) for name, fn in jobs.items()}
                for name, fut in futures.items():
                    res.sm_pols[name] = fut.result()
        return res

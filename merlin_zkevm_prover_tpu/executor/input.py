"""Batch input loading (reference src/prover/input.cpp Input::load).

Parses the executor input JSON (the aggregator's InputProver message /
testvector format): public inputs, batch L2 data, and the state database
preload (`db` SMT nodes + `contractsBytecode` programs).
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Tuple

from ..hashdb.hashdb import HashDB


def _h2i(x) -> int:
    if isinstance(x, str):
        return int(x, 16) if x.startswith("0x") else int(x)
    return int(x)


def _key4(k: str) -> Tuple[int, int, int, int]:
    ki = int(k, 16)
    return tuple((ki >> (64 * i)) & ((1 << 64) - 1) for i in range(4))


def load_input(d: dict) -> dict:
    """Normalize an input JSON dict to the executor's input_data format."""
    out = {}
    for name in ("oldStateRoot", "oldAccInputHash", "globalExitRoot",
                 "sequencerAddr", "newStateRoot", "newAccInputHash",
                 "newLocalExitRoot", "batchHashData"):
        if name in d:
            out[name] = _h2i(d[name])
    for name in ("oldNumBatch", "newNumBatch", "chainID", "forkID",
                 "timestamp"):
        if name in d:
            out[name] = int(d[name])
    data = d.get("batchL2Data", "")
    if isinstance(data, str):
        out["batchL2Data"] = data[2:] if data.startswith("0x") else data
    else:
        out["batchL2Data"] = bytes(data).hex()
    if "traceConfig" in d:
        out["traceConfig"] = d["traceConfig"]
    return out


def load_input_file(path: str) -> dict:
    return load_input(json.load(open(path)))


def load_db_into(hashdb: HashDB, d: dict) -> None:
    """Preload SMT nodes and contract bytecode (reference
    main_executor.cpp:146-170 loadDB/loadProgramDB)."""
    nodes = {}
    for k, v in d.get("db", {}).items():
        nodes[_key4(k)] = [int(x, 16) for x in v]
    if nodes:
        hashdb.load_db(nodes)
    progs = {}
    for k, v in d.get("contractsBytecode", {}).items():
        progs[_key4(k)] = bytes.fromhex(v[2:] if v.startswith("0x") else v)
    if progs:
        hashdb.load_program_db(progs)

"""Config: JSON -> typed config object (reference src/config/config.hpp:
12-173, ~150 fields; the supported subset keeps the reference names)."""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


@dataclass
class Config:
    # process roles (reference config.hpp:21-46)
    runAggregatorClient: bool = False
    runAggregatorServer: bool = False
    runExecutorServer: bool = False
    runHashDBServer: bool = False
    runFileGenBatchProof: str = ""
    runFileGenAggregatedProof: str = ""
    runFileGenFinalProof: str = ""
    runFileProcessBatch: str = ""

    # identity / networking
    proverName: str = "tpu-prover"
    proverID: str = ""
    aggregatorClientHost: str = "127.0.0.1"
    aggregatorClientPort: int = 50081
    aggregatorServerPort: int = 50081
    executorServerPort: int = 50071
    hashDBServerPort: int = 50061
    hashDBURL: str = "local"
    aggregatorClientMaxStreams: int = 0
    aggregatorClientWatchdogTimeout: int = 60 * 60

    # files / artifacts
    inputFile: str = ""
    outputPath: str = "output"
    romFile: str = ""
    pilFile: str = ""  # compiled PIL (main.pil.json); enables the real zkEVM circuit
    zkeyFile: str = ""
    saveInputToFile: bool = False
    saveOutputToFile: bool = False
    saveProofToFile: bool = False

    # database
    databaseURL: str = ":memory:"
    dbMultiWrite: bool = True
    dbCacheSize: int = 1 << 20
    dbReadRetryCounter: int = 10
    dbReadRetryDelay: int = 100

    # prover behavior
    requestsPersistence: int = 3600
    maxExecutorThreads: int = 6
    executorTimeStatistics: bool = False

    # proving sizes
    proverNBits: int = 10
    proverBlowupBits: int = 2
    proverNQueries: int = 16

    extra: Dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def load(source) -> "Config":
        if isinstance(source, str):
            with open(source) as f:
                data = json.load(f)
        else:
            data = dict(source)
        cfg = Config()
        known = {f.name for f in dataclasses.fields(Config)}
        for k, v in data.items():
            if k in known and k != "extra":
                setattr(cfg, k, v)
            else:
                cfg.extra[k] = v
        return cfg

    def print(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    def generate_proof(self) -> bool:
        return bool(
            self.runAggregatorClient or self.runFileGenBatchProof
            or self.runFileGenAggregatedProof or self.runFileGenFinalProof
        )

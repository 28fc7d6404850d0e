"""HashDB64 — bulk-rebuild state tree (reference src/hashdb64/), root-
compatible with the binary SMT (hashdb/smt.py)."""

import random

from merlin_zkevm_prover_tpu.hashdb.database import Database
from merlin_zkevm_prover_tpu.hashdb.hashdb64 import (
    Database64,
    Smt64,
    StateManager64,
)
from merlin_zkevm_prover_tpu.hashdb.smt import Smt, ZERO4


def test_smt64_matches_binary_smt():
    rng = random.Random(42)
    pairs = {}
    for _ in range(25):
        key = tuple(rng.getrandbits(64) for _ in range(4))
        pairs[key] = rng.getrandbits(200)

    # incremental binary SMT
    db = Database()
    smt = Smt()
    root = ZERO4
    for k, v in pairs.items():
        root = smt.set(db, root, k, v).new_root

    # bulk Smt64
    db64 = Database64()
    smt64 = Smt64(db64)
    root64 = smt64.build(pairs)
    assert tuple(root64) == tuple(root)

    # reads agree
    for k, v in list(pairs.items())[:5]:
        assert smt64.get(root64, k).value == v

    # update + delete keep matching
    some = list(pairs)[:3]
    updates = {some[0]: 777, some[1]: 0}
    root2 = smt.set(db, root, some[0], 777).new_root
    root2 = smt.set(db, root2, some[1], 0).new_root
    root64b = smt64.build(updates, root64)
    assert tuple(root64b) == tuple(root2)


def test_state_manager64_flow():
    sm = StateManager64()
    k1 = (1, 2, 3, 4)
    k2 = (5, 6, 7, 8)
    r1 = sm.set("batch1", ZERO4, k1, 100)
    r2 = sm.set("batch1", ZERO4, k2, 200)
    assert sm.get("batch1", r2, k1).value == 100
    assert sm.get("batch1", r2, k2).value == 200
    final = sm.flush("batch1")
    assert final == r2
    assert sm.db.kv_latest[k1] == 100

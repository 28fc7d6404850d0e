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


def test_state_manager64_substate_chain_with_revert():
    """A tx whose middle sub-states revert must consolidate only the
    surviving chain (reference state_manager_64.cpp flush backward walk)."""
    from merlin_zkevm_prover_tpu.hashdb.hashdb64 import (
        PERSISTENCE_TEMPORARY,
        StateManagerError,
    )

    sm = StateManager64()
    u = "batchA"
    r0 = (0, 0, 0, 0)
    rA = (10, 0, 0, 1)
    rB = (20, 0, 0, 2)  # reverted branch
    rC = (30, 0, 0, 3)

    # tx0: open at r0 -> write k1 -> close at rA
    sm.set_old_state_root(u, 0, r0)
    sm.write(u, 0, (1, 1, 1, 1), 111)
    sm.set_new_state_root(u, 0, rA)
    # tx0 continues: a sub-state that gets REVERTED (opens at rA,
    # closes at rB, writes k2) ...
    sm.set_old_state_root(u, 0, rA)
    sm.write(u, 0, (2, 2, 2, 2), 222)
    sm.set_new_state_root(u, 0, rB)
    # ... then the executor rolls back to rA and takes another path
    sm.set_old_state_root(u, 0, rA)
    sm.write(u, 0, (3, 3, 3, 3), 333)
    sm.set_new_state_root(u, 0, rC)

    # temporary-persistence writes are dropped at flush
    sm.set_old_state_root(u, 0, r0, PERSISTENCE_TEMPORARY)
    sm.write(u, 0, (9, 9, 9, 9), 999, PERSISTENCE_TEMPORARY)
    sm.set_new_state_root(u, 0, rA, PERSISTENCE_TEMPORARY)

    # uncommitted reads see the newest write
    assert sm.read(u, (3, 3, 3, 3)) == 333

    flush_id, sent_id = sm.flush_batch(u)
    assert flush_id == sent_id == 1
    # surviving chain: r0->rA (k1), rA->rC (k3); k2 (reverted) pruned
    assert sm.db.kv_latest[(1, 1, 1, 1)] == 111
    assert sm.db.kv_latest[(3, 3, 3, 3)] == 333
    assert (2, 2, 2, 2) not in sm.db.kv_latest
    assert (9, 9, 9, 9) not in sm.db.kv_latest
    # consolidated version recorded for the rebuilt root
    assert sm.db.latest_version == 1
    ver = sm.db.latest_version
    assert sm.db.read_kv(ver, (1, 1, 1, 1)) == 111

    # protocol errors fail loudly
    try:
        sm.set_new_state_root("fresh", 0, rA)
        raise AssertionError("expected StateManagerError")
    except StateManagerError:
        pass


def test_database64_versioned_kv():
    db = Database64()
    k = (7, 7, 7, 7)
    db.write_version((1, 0, 0, 0), 1)
    db.write_kv(1, k, 100)
    db.write_version((2, 0, 0, 0), 2)
    db.write_kv(2, k, 200)
    assert db.read_kv(1, k) == 100
    assert db.read_kv(2, k) == 200
    assert db.read_version((2, 0, 0, 0)) == 2
    assert db.kv_latest[k] == 200
    db.flush()
    st = db.get_flush_status()
    assert st["storedFlushId"] == st["lastFlushId"] == 1

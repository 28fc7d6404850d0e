"""SMT / HashDB tests: set/get/delete state transitions, root determinism,
order independence, cache/flush behavior — the reference's storage test
scenarios (reference test/hashdb/, test/sm/storage/storage_test.cpp)."""

import numpy as np
import pytest

from merlin_zkevm_prover_tpu.hashdb.hashdb import HashDB
from merlin_zkevm_prover_tpu.hashdb.smt import (
    ZERO4,
    fea2scalar,
    join_key,
    remove_key_bits,
    scalar2fea,
    split_key,
)

K1 = (1, 0, 0, 0)
K2 = (3, 0, 0, 0)       # shares first path bit with K1
K3 = (0, 1, 0, 0)


def test_key_bit_interleaving():
    key = (0b1, 0b0, 0b1, 0b1)
    path = split_key(key)
    assert path[:4] == [1, 0, 1, 1]
    assert all(b == 0 for b in path[4:])
    assert join_key(path[:8], remove_key_bits(key, 8)) == key
    v = 0xDEADBEEF_12345678_ABCDEF01_87654321
    assert fea2scalar(scalar2fea(v)) == v


def test_insert_get_roundtrip():
    h = HashDB()
    r = h.set("b1", 0, ZERO4, K1, 100).new_root
    assert r != ZERO4
    got = h.get(r, K1)
    assert got.value == 100
    # miss on another key
    miss = h.get(r, K3)
    assert miss.value == 0


def test_update_and_delete():
    h = HashDB()
    r1 = h.set("b", 0, ZERO4, K1, 5).new_root
    r2 = h.set("b", 0, r1, K1, 7).new_root
    assert h.get(r2, K1).value == 7
    assert r1 != r2
    r3 = h.set("b", 0, r2, K1, 0).new_root
    assert r3 == ZERO4  # tree empty again


def test_two_leaves_split_and_collapse():
    h = HashDB()
    r1 = h.set("b", 0, ZERO4, K1, 11).new_root
    r2 = h.set("b", 0, r1, K2, 22).new_root
    assert h.get(r2, K1).value == 11
    assert h.get(r2, K2).value == 22
    # delete one -> root must equal single-leaf tree of the other
    r3 = h.set("b", 0, r2, K2, 0).new_root
    assert r3 == r1


def test_root_order_independence():
    entries = [(K1, 10), (K2, 20), (K3, 30)]
    roots = []
    for order in ([0, 1, 2], [2, 1, 0], [1, 0, 2]):
        h = HashDB()
        r = ZERO4
        for i in order:
            k, v = entries[i]
            r = h.set("b", 0, r, k, v).new_root
        roots.append(r)
    assert roots[0] == roots[1] == roots[2]


def test_deep_random_state():
    rng = np.random.default_rng(7)
    h = HashDB()
    r = ZERO4
    kv = {}
    for _ in range(40):
        key = tuple(int(x) for x in rng.integers(0, 1 << 63, 4))
        val = int(rng.integers(1, 1 << 60))
        r = h.set("b", 0, r, key, val).new_root
        kv[key] = val
    for k, v in kv.items():
        assert h.get(r, k).value == v
    # delete everything -> empty root
    for k in list(kv):
        r = h.set("b", 0, r, k, 0).new_root
    assert r == ZERO4


def test_program_storage_and_flush():
    h = HashDB(sender_thread=False)
    h.set_program((9, 9, 9, 9), b"\x60\x00\x60\x00")
    assert h.get_program((9, 9, 9, 9)) == b"\x60\x00\x60\x00"
    st = h.get_flush_status()
    assert st["stored_flush_id"] == st["pending_flush_id"]


def test_persistence_across_instances(tmp_path):
    dbfile = str(tmp_path / "state.db")
    h1 = HashDB(backend=dbfile)
    r = h1.set("b", 0, ZERO4, K1, 42).new_root
    h1.flush()
    h1.close()
    h2 = HashDB(backend=dbfile, use_cache=False)
    assert h2.get(r, K1).value == 42

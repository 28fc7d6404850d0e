"""HashDB64 — the batched key-value state tree (reference src/hashdb64/:
Smt64, Database64, StateManager64).

The reference's second-generation state DB defers tree building: writes
accumulate as raw (key, value) pairs per batch, and the Merkle tree is
(re)built once per flush instead of per set — trading per-write hashing
for one bulk rebuild (smt_64.hpp:56-85, database_64.hpp page store).

That design is exactly right for this framework: the bulk rebuild hashes
every dirty path level-by-level, which batches onto the TPU Poseidon
kernels.  Node encodings (leaf capacity [1,0,0,0], branch [0,0,0,0],
value-node hashing) are identical to hashdb/smt.py, so roots agree with
the binary SMT and with production data (tests/test_golden_vectors.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..ops import poseidon_gl
from .smt import (
    ZERO4,
    SmtGetResult,
    SmtSetResult,
    join_key,
    remove_key_bits,
    split_key,
)

Key4 = Tuple[int, int, int, int]


class Database64:
    """Raw node/program/keyvalue store (reference database_64.hpp roles):
    versioned KV pages (key -> [(version, value)] history), a version
    table (consolidated state root -> version), a program store, and the
    flush-id pipeline the remote sender thread exposes through
    getFlushStatus (database_64.hpp multiWrite/senderSem roles — here the
    'send' is immediate, so storedFlushId tracks flushId)."""

    def __init__(self):
        self.nodes: Dict[Key4, List[int]] = {}
        self.programs: Dict[Key4, bytes] = {}
        self.kv_latest: Dict[Key4, int] = {}  # consolidated key -> value
        # versioned KV model
        self.kv_history: Dict[Key4, List[Tuple[int, int]]] = {}
        self.version_by_root: Dict[Key4, int] = {}
        self.latest_version: int = 0
        # flush pipeline counters (reference getFlushStatus fields)
        self.flush_id: int = 0
        self.stored_flush_id: int = 0
        self.last_sent_flush_id: int = 0

    def read_node(self, h: Key4) -> Optional[List[int]]:
        return self.nodes.get(tuple(h))

    def write_node(self, h: Key4, v: List[int]) -> None:
        self.nodes[tuple(h)] = list(v)

    # -- versioned KV (reference Database64::writeKV/readKV/writeVersion) --
    def write_version(self, root: Key4, version: int) -> None:
        self.version_by_root[tuple(root)] = version
        self.latest_version = max(self.latest_version, version)

    def read_version(self, root: Key4) -> Optional[int]:
        return self.version_by_root.get(tuple(root))

    def write_kv(self, version: int, key: Key4, value: int) -> None:
        self.kv_history.setdefault(tuple(key), []).append((version, value))
        if value == 0:
            self.kv_latest.pop(tuple(key), None)
        else:
            self.kv_latest[tuple(key)] = value

    def read_kv(self, version: int, key: Key4) -> Optional[int]:
        """Value of key at the given version (latest write <= version)."""
        hist = self.kv_history.get(tuple(key))
        if not hist:
            return None
        best = None
        for v, val in hist:
            if v <= version and (best is None or v > best[0]):
                best = (v, val)
        return best[1] if best else None

    def flush(self) -> Tuple[int, int]:
        """Advance the flush pipeline; returns (flushId, lastSentFlushId).
        The in-process store persists synchronously, so stored/sent ids
        trail flushId by zero."""
        self.flush_id += 1
        self.stored_flush_id = self.flush_id
        self.last_sent_flush_id = self.flush_id
        return self.flush_id, self.last_sent_flush_id

    def get_flush_status(self) -> dict:
        return {
            "storedFlushId": self.stored_flush_id,
            "storingFlushId": self.flush_id,
            "lastFlushId": self.flush_id,
            "pendingToFlushNodes": 0,
            "pendingToFlushProgram": 0,
            "storingNodes": 0,
            "storingProgram": 0,
        }


@dataclass
class Tx64:
    """Uncommitted writes of one batch tx (StateManager64 sub-state)."""

    writes: Dict[Key4, int] = field(default_factory=dict)
    old_root: Key4 = ZERO4
    new_root: Key4 = ZERO4


class Smt64:
    """Bulk-rebuild sparse Merkle tree with smt.py-compatible hashing."""

    def __init__(self, db: Database64):
        self.db = db

    # -- hashing (identical conventions to hashdb/smt.py) --
    def _hash_save(self, values: List[int]) -> Key4:
        h = tuple(poseidon_gl.permute_host(values)[:4])
        self.db.write_node(h, values)
        return h

    def _hash_value(self, value: int) -> Key4:
        vals = [(value >> (32 * i)) & 0xFFFFFFFF for i in range(8)]
        return self._hash_save(vals + [0, 0, 0, 0])

    def _hash_leaf(self, rkey, vhash) -> Key4:
        return self._hash_save(list(rkey) + list(vhash) + [1, 0, 0, 0])

    def _hash_branch(self, left, right) -> Key4:
        return self._hash_save(list(left) + list(right) + [0, 0, 0, 0])

    # -- bulk tree build --
    def build(self, pairs: Dict[Key4, int], old_root: Key4 = ZERO4) -> Key4:
        """Insert/update all (key, value) pairs over old_root in one bulk
        rebuild; value 0 deletes.  Returns the new root."""
        # materialize existing leaves under old_root, apply updates, and
        # rebuild the affected tree from the full leaf set of this subtree
        leaves = dict(self._collect_leaves(old_root, []))
        for k, v in pairs.items():
            k = tuple(k)
            if v == 0:
                leaves.pop(k, None)
            else:
                leaves[k] = v
        return self._build_rec(
            [(split_key(k), k, v) for k, v in sorted(leaves.items())], 0)

    def _collect_leaves(self, root: Key4, prefix: List[int]):
        if tuple(root) == ZERO4:
            return
        node = self.db.read_node(root)
        if node is None:
            raise KeyError(f"missing node {root}")
        if node[8] == 1:  # leaf: [rkey4 | valueHash4 | 1 0 0 0]
            rkey = tuple(node[0:4])
            key = join_key(prefix, rkey)
            vnode = self.db.read_node(tuple(node[4:8]))
            value = sum((int(x) & 0xFFFFFFFF) << (32 * i)
                        for i, x in enumerate(vnode[0:8]))
            yield key, value
            return
        yield from self._collect_leaves(tuple(node[0:4]), prefix + [0])
        yield from self._collect_leaves(tuple(node[4:8]), prefix + [1])

    def _build_rec(self, items, level: int) -> Key4:
        if not items:
            return ZERO4
        if len(items) == 1:
            path, key, value = items[0]
            rkey = remove_key_bits(key, level)
            return self._hash_leaf(rkey, self._hash_value(value))
        zeros = [it for it in items if it[0][level] == 0]
        ones = [it for it in items if it[0][level] == 1]
        left = self._build_rec(zeros, level + 1)
        right = self._build_rec(ones, level + 1)
        return self._hash_branch(left, right)

    def get(self, root: Key4, key: Key4) -> SmtGetResult:
        res = SmtGetResult(root=tuple(root), key=tuple(key))
        path = split_key(key)
        r = tuple(root)
        level = 0
        while r != ZERO4:
            node = self.db.read_node(r)
            if node[8] == 1:
                rkey = tuple(node[0:4])
                leaf_key = join_key(path[:level], rkey)
                vnode = self.db.read_node(tuple(node[4:8]))
                value = sum((int(x) & 0xFFFFFFFF) << (32 * i)
                            for i, x in enumerate(vnode[0:8]))
                if leaf_key == tuple(key):
                    res.value = value
                return res
            r = tuple(node[0:4]) if path[level] == 0 else tuple(node[4:8])
            level += 1
        return res


# Persistence classes (reference persistence.hpp)
PERSISTENCE_CACHE = 0      # batch-lifetime, consolidated on flush
PERSISTENCE_DATABASE = 1   # durable
PERSISTENCE_TEMPORARY = 2  # dropped at flush
PERSISTENCE_SIZE = 3


@dataclass
class TxSubState64:
    """One executor checkpoint between two state roots; a tx that reverts
    leaves dangling sub-states which flush() later prunes (reference
    state_manager_64.hpp TxSubState64)."""

    old_state_root: Key4 = ZERO4
    new_state_root: Key4 = ZERO4
    previous_sub_state: int = 0
    valid: bool = False
    writes: Dict[Key4, int] = field(default_factory=dict)


@dataclass
class TxPersistenceState64:
    old_state_root: Key4 = ZERO4
    new_state_root: Key4 = ZERO4
    current_sub_state: int = 0
    sub_states: List[TxSubState64] = field(default_factory=list)


@dataclass
class TxState64:
    persistence: List[TxPersistenceState64] = field(
        default_factory=lambda: [TxPersistenceState64()
                                 for _ in range(PERSISTENCE_SIZE)])


@dataclass
class BatchState64:
    old_state_root: Key4 = ZERO4
    current_state_root: Key4 = ZERO4
    current_tx: int = 0
    tx_states: List[TxState64] = field(default_factory=list)


class StateManagerError(Exception):
    """ZKR_STATE_MANAGER analog: inconsistent root/sub-state bookkeeping."""


class StateManager64:
    """Per-batch, per-tx sub-state accumulation with revert-aware
    consolidation (reference state_manager_64.cpp).

    The executor opens a sub-state per checkpoint (setOldStateRoot),
    writes key/values into it, and closes it (setNewStateRoot).  A
    reverted tx leaves orphan sub-states; flush() walks BACKWARD from
    each tx's final root to its old root marking the surviving chain
    valid (state_manager_64.cpp flush:66-110), prunes the rest, bulk-
    rebuilds the tree from the surviving writes, and consolidates the
    version/KV view in Database64."""

    def __init__(self, db: Optional[Database64] = None):
        self.db = db or Database64()
        self.smt = Smt64(self.db)
        self.state: Dict[str, BatchState64] = {}
        self.batches: Dict[str, Tx64] = {}  # simple-facade bookkeeping

    # -- reference API ---------------------------------------------------
    def set_old_state_root(self, batch_uuid: str, tx: int, root: Key4,
                           persistence: int = PERSISTENCE_CACHE) -> None:
        self._set_state_root(batch_uuid, tx, tuple(root), True, persistence)

    def set_new_state_root(self, batch_uuid: str, tx: int, root: Key4,
                           persistence: int = PERSISTENCE_CACHE) -> None:
        self._set_state_root(batch_uuid, tx, tuple(root), False, persistence)

    def _set_state_root(self, batch_uuid: str, tx: int, root: Key4,
                        is_old: bool, persistence: int) -> None:
        if not 0 <= persistence < PERSISTENCE_SIZE:
            raise StateManagerError(f"invalid persistence {persistence}")
        bs = self.state.get(batch_uuid)
        if bs is None:
            if not is_old:
                raise StateManagerError(
                    "setNewStateRoot before any setOldStateRoot")
            bs = BatchState64(old_state_root=root)
            self.state[batch_uuid] = bs
        bs.current_state_root = root
        if tx >= len(bs.tx_states):
            if not is_old:
                raise StateManagerError(f"tx {tx} does not exist yet")
            while len(bs.tx_states) <= tx:
                bs.tx_states.append(TxState64())
            bs.current_tx = tx
        ps = bs.tx_states[tx].persistence[persistence]
        if is_old:
            if not ps.sub_states:
                if ps.current_sub_state != 0:
                    raise StateManagerError("currentSubState != 0 at open")
                ps.old_state_root = root
            sub = TxSubState64(old_state_root=root,
                               previous_sub_state=ps.current_sub_state)
            ps.sub_states.append(sub)
            ps.current_sub_state = len(ps.sub_states) - 1
        else:
            if not ps.sub_states:
                raise StateManagerError("setNewStateRoot with no sub-state")
            ps.sub_states[ps.current_sub_state].new_state_root = root
            ps.new_state_root = root

    def write(self, batch_uuid: str, tx: int, key: Key4, value: int,
              persistence: int = PERSISTENCE_CACHE) -> None:
        bs = self.state.get(batch_uuid)
        if bs is None or tx >= len(bs.tx_states):
            raise StateManagerError("write before setOldStateRoot")
        ps = bs.tx_states[tx].persistence[persistence]
        if not ps.sub_states:
            raise StateManagerError("write with no open sub-state")
        ps.sub_states[ps.current_sub_state].writes[tuple(key)] = value

    def delete_node(self, batch_uuid: str, tx: int, key: Key4,
                    persistence: int = PERSISTENCE_CACHE) -> None:
        self.write(batch_uuid, tx, key, 0, persistence)

    def read(self, batch_uuid: str, key: Key4) -> Optional[int]:
        """Latest uncommitted value of key across the batch's sub-states
        (newest first), falling back to the consolidated KV view."""
        bs = self.state.get(batch_uuid)
        key = tuple(key)
        if bs is not None:
            for txs in reversed(bs.tx_states):
                for ps in txs.persistence[:2]:
                    for sub in reversed(ps.sub_states):
                        if key in sub.writes:
                            return sub.writes[key]
        return self.db.kv_latest.get(key)

    def semi_flush(self, batch_uuid: str, new_root: Key4,
                   persistence: int = PERSISTENCE_CACHE) -> None:
        """Mark the running tx's final root (reference semiFlush: called
        at tx end so flush() knows each tx's terminal state)."""
        bs = self.state.get(batch_uuid)
        if bs is None:
            return
        bs.current_state_root = tuple(new_root)

    def _resolve_valid_chain(self, ps: TxPersistenceState64) -> List[int]:
        """Backward walk newStateRoot -> oldStateRoot marking the valid
        sub-state chain (reference flush, state_manager_64.cpp)."""
        if not ps.sub_states:
            return []
        cur = ps.current_sub_state
        if ps.sub_states[cur].new_state_root != ps.new_state_root:
            raise StateManagerError("current sub-state root mismatch")
        chain = []
        while True:
            ps.sub_states[cur].valid = True
            chain.append(cur)
            if cur == 0:
                if ps.sub_states[0].old_state_root != ps.old_state_root:
                    raise StateManagerError("chain does not reach oldRoot")
                break
            prev = ps.sub_states[cur].previous_sub_state
            if ps.sub_states[prev].new_state_root == \
                    ps.sub_states[cur].old_state_root:
                cur = prev
                continue
            # a revert broke the chain: search an earlier matching substate
            for i in range(cur):
                if ps.sub_states[i].new_state_root == \
                        ps.sub_states[cur].old_state_root:
                    prev = i
                    break
            else:
                raise StateManagerError("broken sub-state chain")
            cur = prev
        return list(reversed(chain))

    def flush_batch(self, batch_uuid: str) -> Tuple[int, int]:
        """Consolidate a batch: resolve valid sub-state chains per tx,
        apply surviving writes in order, bulk-rebuild the tree, record the
        consolidated root version, and advance the flush pipeline.
        Returns (flushId, lastSentFlushId)."""
        bs = self.state.pop(batch_uuid, None)
        if bs is None:
            return self.db.flush()
        writes: Dict[Key4, int] = {}
        for txs in bs.tx_states:
            for persistence in range(PERSISTENCE_SIZE):
                ps = txs.persistence[persistence]
                if persistence == PERSISTENCE_TEMPORARY:
                    ps.sub_states.clear()
                    ps.current_sub_state = 0
                    continue
                if not ps.sub_states:
                    continue
                for idx in self._resolve_valid_chain(ps):
                    writes.update(ps.sub_states[idx].writes)
        if writes:
            new_root = self.smt.build(writes, bs.old_state_root)
            version = self.db.latest_version + 1
            self.db.write_version(new_root, version)
            for k, v in writes.items():
                self.db.write_kv(version, k, v)
        return self.db.flush()

    def cancel_batch(self, batch_uuid: str) -> None:
        self.state.pop(batch_uuid, None)
        self.batches.pop(batch_uuid, None)

    # -- simple facade (used by the hashdb service fast path) -------------
    def set(self, batch_uuid: str, old_root: Key4, key: Key4,
            value: int) -> Key4:
        tx = self.batches.setdefault(batch_uuid, Tx64(old_root=old_root))
        if not tx.writes:
            tx.old_root = tuple(old_root)
        tx.writes[tuple(key)] = value
        # the reference computes the running root eagerly for the executor
        tx.new_root = self.smt.build(tx.writes, tx.old_root)
        return tx.new_root

    def get(self, batch_uuid: str, root: Key4, key: Key4) -> SmtGetResult:
        return self.smt.get(root, key)

    def flush(self, batch_uuid: str) -> Key4:
        """Consolidate the facade batch: apply writes to the KV view."""
        tx = self.batches.pop(batch_uuid, None)
        if tx is None:
            return ZERO4
        version = self.db.latest_version + 1
        self.db.write_version(tx.new_root, version)
        for k, v in tx.writes.items():
            self.db.write_kv(version, k, v)
        self.db.flush()
        return tx.new_root

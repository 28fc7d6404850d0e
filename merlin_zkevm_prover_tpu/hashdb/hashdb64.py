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
    """Raw node/program/keyvalue store (reference database_64.hpp roles)."""

    def __init__(self):
        self.nodes: Dict[Key4, List[int]] = {}
        self.programs: Dict[Key4, bytes] = {}
        self.kv_latest: Dict[Key4, int] = {}  # consolidated key -> value

    def read_node(self, h: Key4) -> Optional[List[int]]:
        return self.nodes.get(tuple(h))

    def write_node(self, h: Key4, v: List[int]) -> None:
        self.nodes[tuple(h)] = list(v)


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


class StateManager64:
    """Per-batch write accumulation + consolidation (reference
    state_manager_64.cpp flush semantics)."""

    def __init__(self, db: Optional[Database64] = None):
        self.db = db or Database64()
        self.smt = Smt64(self.db)
        self.batches: Dict[str, Tx64] = {}

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
        """Consolidate the batch: apply writes to the latest kv view."""
        tx = self.batches.pop(batch_uuid, None)
        if tx is None:
            return ZERO4
        for k, v in tx.writes.items():
            if v == 0:
                self.db.kv_latest.pop(k, None)
            else:
                self.db.kv_latest[k] = v
        return tx.new_root

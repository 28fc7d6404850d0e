"""Sparse Merkle tree over Goldilocks quads (reference src/hashdb/smt.cpp).

Node encoding, bit-exact with the reference:
  * branch:  H([left0..3 | right0..3 | 0,0,0,0])            (capacity zero)
  * leaf:    H([rkey0..3 | valueHash0..3 | 1,0,0,0])        (capacity one)
  * valueHash = H([v0..v7 | 0,0,0,0]) with the 256-bit value split into
    8 32-bit felts (scalar2fea, reference src/utils/scalar.hpp:38-66)
  * path bits interleave the four key felts: path[4i+j] = bit i of key[j]
    (Smt::splitKey, smt.cpp:1001-1019); a leaf at level L stores the
    remaining key with the first L interleaved bits removed
    (Smt::removeKeyBits, smt.cpp:1052-1075).

Insert/update/delete walk the path, splitting leaves on divergence and
collapsing single-leaf branches on delete — same state transitions as
Smt::set (smt.cpp:10-802), implemented recursively from scratch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from .. import native
from ..ops import poseidon_gl
from ..ops.goldilocks import P

ZERO4 = (0, 0, 0, 0)


def scalar2fea(value: int) -> List[int]:
    """256-bit scalar -> 8 felts of 32 bits each."""
    return [(value >> (32 * i)) & 0xFFFFFFFF for i in range(8)]


def fea2scalar(fea: List[int]) -> int:
    return sum(int(v) << (32 * i) for i, v in enumerate(fea))


def split_key(key: Tuple[int, int, int, int]) -> List[int]:
    """Interleaved path bits: path[4i+j] = bit i of key[j]."""
    path = []
    for i in range(64):
        for j in range(4):
            path.append((key[j] >> i) & 1)
    return path


def remove_key_bits(key: Tuple[int, int, int, int], n_bits: int):
    """Strip the first n_bits interleaved path bits from the key."""
    full = n_bits // 4
    out = []
    for j in range(4):
        n = full + (1 if full * 4 + j < n_bits else 0)
        out.append(key[j] >> n)
    return tuple(out)


def join_key(bits: List[int], rkey) -> Tuple[int, int, int, int]:
    """Inverse of remove_key_bits for a used path prefix."""
    n = [0, 0, 0, 0]
    accs = [0, 0, 0, 0]
    for i, b in enumerate(bits):
        if b:
            accs[i % 4] |= 1 << n[i % 4]
        n[i % 4] += 1
    return tuple((rkey[j] << n[j]) | accs[j] for j in range(4))


def _hash_branch(db, left, right):
    v = list(left) + list(right) + [0, 0, 0, 0]
    h = tuple(native.poseidon_permute(v)[:4])
    db.write_node(h, v)
    return h


def _hash_leaf(db, rkey, value_hash):
    v = list(rkey) + list(value_hash) + [1, 0, 0, 0]
    h = tuple(native.poseidon_permute(v)[:4])
    db.write_node(h, v)
    return h


def _hash_value(db, value: int):
    v = scalar2fea(value) + [0, 0, 0, 0]
    h = tuple(native.poseidon_permute(v)[:4])
    db.write_node(h, v)
    return h


@dataclass
class SmtSetResult:
    old_root: Tuple[int, ...] = ZERO4
    new_root: Tuple[int, ...] = ZERO4
    key: Tuple[int, ...] = ZERO4
    new_value: int = 0
    old_value: int = 0
    mode: str = ""
    ins_key: Tuple[int, ...] = ZERO4
    ins_value: int = 0
    is_old0: bool = True
    siblings: Dict[int, List[int]] = field(default_factory=dict)
    proof_hash_counter: int = 0


@dataclass
class SmtGetResult:
    root: Tuple[int, ...] = ZERO4
    key: Tuple[int, ...] = ZERO4
    value: int = 0
    ins_key: Tuple[int, ...] = ZERO4
    ins_value: int = 0
    is_old0: bool = True
    siblings: Dict[int, List[int]] = field(default_factory=dict)
    proof_hash_counter: int = 0


class Smt:
    """Stateless SMT engine over a node database."""

    def _is_leaf(self, node_value: List[int]) -> bool:
        return node_value[8] == 1

    def _read(self, db, root):
        v = db.read_node(tuple(root))
        if v is None:
            raise KeyError(f"SMT node not found: {root}")
        return v

    # ------------------------------------------------------------------
    def get(self, db, root, key) -> SmtGetResult:
        res = SmtGetResult(root=tuple(root), key=tuple(key))
        path = split_key(key)
        level = 0
        r = tuple(root)
        counter = 0
        while r != ZERO4:
            v = self._read(db, r)
            counter += 1
            if self._is_leaf(v):
                rkey = tuple(v[0:4])
                leaf_key = join_key(path[:level], rkey)
                value_v = self._read(db, tuple(v[4:8]))
                counter += 1
                value = fea2scalar(value_v[0:8])
                if leaf_key == tuple(key):
                    res.value = value
                    res.is_old0 = False
                else:
                    res.ins_key = leaf_key
                    res.ins_value = value
                    res.is_old0 = False
                    res.value = 0
                res.proof_hash_counter = counter
                return res
            sib = v[4:8] if path[level] == 0 else v[0:4]
            res.siblings[level] = list(v)
            r = tuple(v[0:4]) if path[level] == 0 else tuple(v[4:8])
            level += 1
        res.proof_hash_counter = counter
        return res

    # ------------------------------------------------------------------
    def set(self, db, old_root, key, value: int) -> SmtSetResult:
        res = SmtSetResult(old_root=tuple(old_root), key=tuple(key),
                           new_value=value)
        path = split_key(key)
        get_res = self.get(db, old_root, key) if tuple(old_root) != ZERO4 \
            else None
        res.old_value = get_res.value if get_res else 0

        new_root = self._set_rec(db, tuple(old_root), path, 0, key, value, res)
        res.new_root = new_root
        return res

    def _leaf_for(self, db, key, level: int, value: int):
        rkey = remove_key_bits(key, level)
        vh = _hash_value(db, value)
        return _hash_leaf(db, rkey, vh)

    def _set_rec(self, db, r, path, level, key, value, res):
        if r == ZERO4:
            if value == 0:
                res.mode = res.mode or "zeroToZero"
                return ZERO4
            res.mode = res.mode or "insertNotFound"
            return self._leaf_for(db, key, level, value)

        v = self._read(db, r)
        if self._is_leaf(v):
            rkey = tuple(v[0:4])
            leaf_key = join_key(path[:level], rkey)
            if leaf_key == tuple(key):
                if value == 0:
                    res.mode = res.mode or "deleteFound"
                    return ZERO4
                res.mode = res.mode or "update"
                return self._leaf_for(db, key, level, value)
            # different leaf on our path
            if value == 0:
                res.mode = res.mode or "zeroToZero"
                return r
            res.mode = res.mode or "insertFound"
            other_path = split_key(leaf_key)
            return self._split(db, path, other_path, level, key, value,
                               leaf_key, v)
        # branch node
        left = tuple(v[0:4])
        right = tuple(v[4:8])
        if path[level] == 0:
            left = self._set_rec(db, left, path, level + 1, key, value, res)
        else:
            right = self._set_rec(db, right, path, level + 1, key, value, res)
        if left == ZERO4 and right == ZERO4:
            return ZERO4
        # collapse if the only child is a leaf (delete path shortening)
        if value == 0:
            only, is_right = None, None
            if left == ZERO4 and right != ZERO4:
                only, is_right = right, True
            elif right == ZERO4 and left != ZERO4:
                only, is_right = left, False
            if only is not None:
                child = self._read(db, only)
                if self._is_leaf(child):
                    # re-key the leaf one level up
                    crkey = tuple(child[0:4])
                    child_key = join_key(
                        path[:level] + [1 if is_right else 0], crkey
                    )
                    new_rkey = remove_key_bits(child_key, level)
                    return _hash_leaf(db, new_rkey, tuple(child[4:8]))
        return _hash_branch(db, left, right)

    def _split(self, db, path, other_path, level, key, value, other_key,
               other_leaf):
        """Create branches until the two keys diverge, then hang both."""
        if path[level] != other_path[level]:
            mine = self._leaf_for(db, key, level + 1, value)
            other_rkey = remove_key_bits(other_key, level + 1)
            other = _hash_leaf(db, other_rkey, tuple(other_leaf[4:8]))
            if path[level] == 0:
                return _hash_branch(db, mine, other)
            return _hash_branch(db, other, mine)
        child = self._split(db, path, other_path, level + 1, key, value,
                            other_key, other_leaf)
        if path[level] == 0:
            return _hash_branch(db, child, ZERO4)
        return _hash_branch(db, ZERO4, child)

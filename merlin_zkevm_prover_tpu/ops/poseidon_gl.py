"""Poseidon permutation over Goldilocks (width 12), vectorized for the TPU VPU.

Re-creates the capability of the reference `PoseidonGoldilocks` API
(reference call sites: src/starkpil/merkleTree/merkleTreeGL.cpp:37-44,
src/starkpil/transcript/transcript.cpp:23,46, src/hashdb/smt.cpp:1080):

  * ``permute(state)``        — the raw 30-round permutation, batched
  * ``linear_hash(rows)``     — sponge over arbitrary-width rows (rate 8,
                                capacity chained from the previous digest)
  * ``merkelize(source)``     — full Poseidon binary Merkle tree
  * ``permute_host(list12)``  — pure-python scalar permutation (transcript)

Round structure per reference src/sm/poseidon_g/poseidon_g_executor.cpp:
174-205: each of the 30 rounds adds per-lane constants, applies x^7 to all
lanes (full rounds: first 4 and last 4) or lane 0 only (22 partial rounds),
then multiplies by the circulant-plus-diagonal MDS matrix.

TPU-native design:
  * state is one GL (2x uint32 limb) array of shape (12, batch) — lanes
    leading, batch on the 128-lane axis;
  * rounds are a lax.scan (three segments: full/partial/full), so the
    compiled graph is one round body, not 30 unrolled rounds;
  * the MDS multiply exploits the circulant structure:
    out = sum_d CIRC[d] * roll(state, -d) (+ 8*state on lane 0), computed in
    16-bit limb space where every scaled sum fits uint32, then one 128-bit
    reduction — ~12 rolls and ~48 VPU multiplies instead of 144 field muls.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from .goldilocks import GL, P
from .poseidon_constants import (
    CAPACITY,
    HASH_SIZE,
    MDS,
    MDS_CIRC,
    MDS_DIAG,
    N_FULL_ROUNDS,
    N_PARTIAL_ROUNDS,
    RATE,
    ROUND_CONSTANTS,
    WIDTH,
)

N_ROUNDS = N_FULL_ROUNDS + N_PARTIAL_ROUNDS
_HALF_F = N_FULL_ROUNDS // 2

_MASK16 = np.uint32(0xFFFF)


def _pow7(a: GL) -> GL:
    a2 = gl.mul(a, a)
    a4 = gl.mul(a2, a2)
    a3 = gl.mul(a2, a)
    return gl.mul(a3, a4)


def _mds(state: GL) -> GL:
    """Circulant MDS on a (12, B) state via rolls in 16-bit limb space."""
    limbs = [
        state.lo & _MASK16,
        state.lo >> 16,
        state.hi & _MASK16,
        state.hi >> 16,
    ]
    acc = [None] * 4
    for d in range(WIDTH):
        c = np.uint32(MDS_CIRC[d])
        for k in range(4):
            rolled = limbs[k] if d == 0 else jnp.roll(limbs[k], -d, axis=0)
            term = rolled * c
            acc[k] = term if acc[k] is None else acc[k] + term
    # diagonal: M[0][0] += MDS_DIAG[0]; only lane 0 gets the extra term
    diag = np.uint32(MDS_DIAG[0])
    lane0 = jnp.zeros((WIDTH, 1), dtype=jnp.uint32).at[0, 0].set(diag)
    for k in range(4):
        acc[k] = acc[k] + limbs[k] * lane0
    # each acc[k] < 13 * 2^16 * 64 < 2^26; carry-propagate base-2^16 digits
    d0 = acc[0] & _MASK16
    t1 = acc[1] + (acc[0] >> 16)
    d1 = t1 & _MASK16
    t2 = acc[2] + (t1 >> 16)
    d2 = t2 & _MASK16
    t3 = acc[3] + (t2 >> 16)
    d3 = t3 & _MASK16
    d4 = t3 >> 16
    r0 = d0 | (d1 << 16)
    r1 = d2 | (d3 << 16)
    return gl._reduce128(r0, r1, d4, jnp.zeros_like(d4))


@functools.lru_cache(maxsize=None)
def _rc_np(lo_rounds: int, hi_rounds: int) -> np.ndarray:
    return np.array(
        [
            [ROUND_CONSTANTS[r * WIDTH + s] % P for s in range(WIDTH)]
            for r in range(lo_rounds, hi_rounds)
        ],
        dtype=np.uint64,
    )


@functools.lru_cache(maxsize=1)
def _full_round_mask() -> np.ndarray:
    """(N_ROUNDS, WIDTH, 1) uint32 mask: 1 where the sbox applies."""
    m = np.zeros((N_ROUNDS, WIDTH, 1), dtype=np.uint32)
    m[:_HALF_F] = 1
    m[_HALF_F + N_PARTIAL_ROUNDS:] = 1
    m[:, 0] = 1  # lane 0 always goes through the sbox
    return m


def _round_body(st: GL, xs):
    consts, mask = xs
    st = gl.add(st, GL(consts.lo[:, None], consts.hi[:, None]))
    # partial rounds sbox lane 0 only: compute x^7 on every lane and
    # mask-select — one scan body for all 30 rounds keeps the compiled
    # graph small (3x fewer loop instantiations than split segments),
    # and full rounds dominate the sponge's cost profile anyway
    st7 = _pow7(st)
    st = GL(
        jnp.where(mask, st7.lo, st.lo),
        jnp.where(mask, st7.hi, st.hi),
    )
    return _mds(st), None


def permute(state: GL) -> GL:
    """The 30-round Poseidon permutation; state is GL of shape (12, batch)."""
    assert state.shape[0] == WIDTH
    squeeze = False
    if state.lo.ndim == 1:
        state = state.reshape(WIDTH, 1)
        squeeze = True
    rc = gl.from_u64(_rc_np(0, N_ROUNDS))
    st, _ = jax.lax.scan(
        _round_body, state, (rc, jnp.asarray(_full_round_mask()))
    )
    return st.reshape(WIDTH) if squeeze else st


def linear_hash(rows: GL) -> GL:
    """Sponge-hash each row of a (n_rows, width) GL matrix to 4 felts.

    Matches the reference ``PoseidonGoldilocks::linear_hash`` semantics: rows
    of width <= 4 are returned zero-padded without hashing; otherwise the row
    is absorbed in rate-8 chunks (zero-padded), with the capacity of every
    chunk after the first set to the first 4 lanes of the previous
    permutation output.  Returns GL of shape (n_rows, 4).
    """
    n_rows, width = rows.shape
    if width <= CAPACITY:
        pad = CAPACITY - width
        return GL(
            jnp.pad(rows.lo, ((0, 0), (0, pad))),
            jnp.pad(rows.hi, ((0, 0), (0, pad))),
        )
    n_chunks = -(-width // RATE)
    pad = n_chunks * RATE - width
    # (n_chunks, RATE, n_rows): scan over chunks, batch on the last axis
    xs = GL(
        jnp.pad(rows.lo, ((0, 0), (0, pad))).reshape(n_rows, n_chunks, RATE).transpose(1, 2, 0),
        jnp.pad(rows.hi, ((0, 0), (0, pad))).reshape(n_rows, n_chunks, RATE).transpose(1, 2, 0),
    )

    def body(digest: GL, chunk: GL):
        state = GL(
            jnp.concatenate([chunk.lo, digest.lo], axis=0),
            jnp.concatenate([chunk.hi, digest.hi], axis=0),
        )
        outs = permute(state)
        return outs[:CAPACITY], None

    digest, _ = jax.lax.scan(body, gl.zeros((CAPACITY, n_rows)), xs)
    return GL(digest.lo.T, digest.hi.T)


def node_hash(left: GL, right: GL) -> GL:
    """Parent node = permute([left4 | right4 | 0^4])[:4]; (n, 4) in/out."""
    n = left.shape[0]
    state = GL(
        jnp.concatenate([left.lo.T, right.lo.T, jnp.zeros((CAPACITY, n), jnp.uint32)]),
        jnp.concatenate([left.hi.T, right.hi.T, jnp.zeros((CAPACITY, n), jnp.uint32)]),
    )
    outs = permute(state)
    return GL(outs.lo[:HASH_SIZE].T, outs.hi[:HASH_SIZE].T)


# Above this height the per-level compute waste of the fixed-buffer loop
# form (levels * h/2 hashes instead of h-1) outweighs its compile-time win;
# large TPU trees route through the Pallas kernels anyway.
_LOOP_MAX_H = 1 << 16


def _merkle_nodes_loop(leaves: GL) -> GL:
    """Fixed-buffer fori_loop tree build: ONE compiled node-hash body shared
    by every level (vs one scan instantiation per level in the unrolled
    form).  Each iteration hashes a full h/2-pair batch; only the shrinking
    valid prefix is meaningful, and each output region's owning level is the
    last write that touches it, so garbage blocks are always overwritten."""
    h = leaves.shape[0]
    levels = h.bit_length() - 1
    half = h // 2
    out_sz = h - 1 + half  # scratch tail absorbs the fixed-size block writes

    def body(lvl, carry):
        buf, out, off = carry
        zero = jnp.zeros((), off.dtype)
        nh = node_hash(buf[0::2], buf[1::2])  # (half, 4); valid prefix only
        out = GL(
            jax.lax.dynamic_update_slice(out.lo, nh.lo, (off, zero)),
            jax.lax.dynamic_update_slice(out.hi, nh.hi, (off, zero)),
        )
        buf = GL(
            jax.lax.dynamic_update_slice(buf.lo, nh.lo, (zero, zero)),
            jax.lax.dynamic_update_slice(buf.hi, nh.hi, (zero, zero)),
        )
        return buf, out, off + (h >> (lvl + 1))

    _, out, _ = jax.lax.fori_loop(
        0, levels, body, (leaves, gl.zeros((out_sz, 4)), jnp.int32(0))
    )
    return out[: h - 1]


def merkle_nodes(leaves: GL) -> GL:
    """All tree levels above the given (h, 4) leaf digests: (h-1, 4),
    bottom-up with the root last — matching the reference MerkleTreeGL node
    layout (merkleTreeGL.hpp:24-41)."""
    h = leaves.shape[0]
    if h <= 1:
        return gl.zeros((0, 4))
    if 4 <= h <= _LOOP_MAX_H and (h & (h - 1)) == 0:
        return _merkle_nodes_loop(leaves)
    levels = []
    cur = leaves
    while cur.shape[0] > 1:
        cur = node_hash(cur[0::2], cur[1::2])
        levels.append(cur)
    return gl.concat(levels, axis=0) if levels else gl.zeros((0, 4))


def merkelize(source: GL) -> GL:
    """Full tree of a (height, width) source matrix: (2h-1, 4) node array."""
    leaves = linear_hash(source)
    upper = merkle_nodes(leaves)
    return gl.concat([leaves, upper], axis=0)


# Shape-cached jits: the leaf hash compiles per (h, w); the upper levels
# compile once per height and are shared by every tree of that height
# (all five commit trees in a proof have the same height).
linear_hash_jit = jax.jit(linear_hash)
merkle_nodes_jit = jax.jit(merkle_nodes)

# TPU fast path: large trees route to the Pallas kernels
# (ops/poseidon_tpu.py); the jnp path stays as CPU/oracle.
_TPU_MIN_ROWS = 1 << 12


@functools.lru_cache(maxsize=1)
def _tpu_kernels():
    try:
        from . import poseidon_tpu

        if poseidon_tpu.available():
            return poseidon_tpu
    except Exception:  # pragma: no cover
        pass
    return None


@functools.lru_cache(maxsize=None)
def _merkelize_tpu_jit():
    return jax.jit(_tpu_kernels().merkelize_tpu)


def merkelize_best(source: GL) -> GL:
    """Dispatching merkelize, safe to call inside an enclosing jit."""
    if source.shape[0] >= _TPU_MIN_ROWS and _tpu_kernels() is not None:
        return _tpu_kernels().merkelize_tpu(source)
    return merkelize(source)


def merkelize_cached(source: GL) -> GL:
    if source.shape[0] >= _TPU_MIN_ROWS and _tpu_kernels() is not None:
        return _merkelize_tpu_jit()(source)
    leaves = linear_hash_jit(source)
    upper = merkle_nodes_jit(leaves)
    return gl.concat([leaves, upper], axis=0)


# ---------------------------------------------------------------------------
# Host (python-int) forms — used by the Fiat-Shamir transcript and the SMT,
# which are tiny and irreducibly sequential.
# ---------------------------------------------------------------------------


def permute_host(state: Sequence[int]) -> List[int]:
    st = [s % P for s in state]
    for r in range(N_ROUNDS):
        st = [(st[s] + ROUND_CONSTANTS[r * WIDTH + s]) % P for s in range(WIDTH)]
        if r < _HALF_F or r >= _HALF_F + N_PARTIAL_ROUNDS:
            st = [pow(s, 7, P) for s in st]
        else:
            st = [pow(st[0], 7, P)] + st[1:]
        st = [sum(MDS[x][y] * st[y] for y in range(WIDTH)) % P for x in range(WIDTH)]
    return st


def hash_host(inputs: Sequence[int]) -> List[int]:
    return permute_host(list(inputs))[:HASH_SIZE]


def linear_hash_host(values: Sequence[int]) -> List[int]:
    size = len(values)
    if size <= CAPACITY:
        return list(values) + [0] * (CAPACITY - size)
    digest = [0] * CAPACITY
    for off in range(0, size, RATE):
        chunk = list(values[off : off + RATE])
        chunk += [0] * (RATE - len(chunk))
        digest = permute_host(chunk + digest)[:CAPACITY]
    return digest

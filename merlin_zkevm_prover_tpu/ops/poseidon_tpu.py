"""High-throughput Pallas TPU kernels for Poseidon-Goldilocks hashing.

This is the production device path for the reference's hot loop #3 —
`PoseidonGoldilocks::merkletree_avx` / `linear_hash` (reference call sites
src/starkpil/merkleTree/merkleTreeGL.cpp:37-44, starks.cpp:687-691) — built
TPU-first:

  * the 12-lane sponge state lives as 24 separate SSA values (12 lanes x
    {lo, hi} uint32) of shape (R, 128): batch occupies both the sublane and
    lane axes of the VPU, every op is a full-width vector op, and there are
    no cross-lane shuffles at all (the circulant MDS is unrolled over the
    static lane index);
  * all 30 rounds run out of VMEM/vector registers — one HBM read and one
    write per element for the entire permutation (the jnp scan formulation
    materializes the state to HBM every round);
  * `linear_hash` fuses the whole rate-8 sponge over a row of any width into
    one kernel (chunk loop via dynamic leading-axis slices), so a 665-column
    trace row costs one HBM read of the row and one 4-felt write;
  * Merkle levels use a fused pair-hash kernel; level-to-level reshapes are
    cheap XLA transposes.

Field arithmetic is the same 2x-uint32-limb Goldilocks as ops/goldilocks.py
(16-bit half-word products + the 2^64 = 2^32 - 1 reduction), so results are
bit-exact with the jnp path and with the reference's uint64 arithmetic.

The MDS multiply accumulates in 22-bit limb space: every scaled sum fits
uint32 (sum of circulant coefficients is 264 + 8 diagonal < 2^9, so
accumulators stay < 2^31), followed by a single 96-bit reduction.

Round internals use *deferred canonicalization*: all field ops keep values
as arbitrary residues in [0, 2^64) (every reduction folds 2^64 = EPS and
2^96 = -1 but skips the final >= p normalization), which is sound because
every consumer — the 64x64 multiply, the carry-folding add, the MDS limb
split — is residue-preserving on full uint64 inputs.  Outputs are
canonicalized once after the last round, so results stay bit-exact with
the jnp path and the reference's uint64 arithmetic.  x^7 runs as two
squarings (3 half-products instead of 4) plus two multiplies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .goldilocks import EPSILON, GL, P
from .poseidon_constants import (
    CAPACITY,
    HASH_SIZE,
    MDS_CIRC,
    MDS_DIAG,
    N_FULL_ROUNDS,
    N_PARTIAL_ROUNDS,
    RATE,
    ROUND_CONSTANTS,
    WIDTH,
)

try:  # pallas import is environment-dependent
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

N_ROUNDS = N_FULL_ROUNDS + N_PARTIAL_ROUNDS
_HALF_F = N_FULL_ROUNDS // 2
_M16 = np.uint32(0xFFFF)
_EPS = np.uint32(EPSILON & 0xFFFFFFFF)
_U32MAX = np.uint32(0xFFFFFFFF)

# batch tile: (R_SUB sublanes, 128 lanes) per lane value
R_SUB = 16
BLOCK_B = R_SUB * 128

# VMEM budget for a linear-hash input block: Mosaic double-buffers the
# (w, r_sub, 128) lo+hi grid blocks, so bytes = w * r_sub * 128 * 4 * 2 * 2.
# The zkEVM's 665-column rows (w = 84 chunks * 8 = 672 lanes) overflow the
# ~16 MB VMEM at r_sub 16; drop to the u32 tiling floor of 8 sublanes.
_VMEM_BLOCK_BUDGET = 12 << 20


def _r_sub_for(w: int) -> int:
    r = R_SUB
    while r > 8 and w * r * 128 * 4 * 4 > _VMEM_BLOCK_BUDGET:
        r //= 2
    return r


def _rc_tables():
    vals = [ROUND_CONSTANTS[i] % P for i in range(N_ROUNDS * WIDTH)]
    lo = np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    hi = np.array([v >> 32 for v in vals], dtype=np.uint32)
    return lo.reshape(N_ROUNDS, WIDTH), hi.reshape(N_ROUNDS, WIDTH)


_RC_LO, _RC_HI = _rc_tables()


# ---------------------------------------------------------------------------
# uint32-limb field primitives (traced inside the kernel)
# ---------------------------------------------------------------------------


def _u32(x):
    return x.astype(jnp.uint32)


def _mul32(a, b):
    """Full 32x32 -> 64 product as (lo, hi) uint32 via 16-bit halves."""
    al = a & _M16
    ah = a >> 16
    bl = b & _M16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    midc = _u32(mid < lh)
    lo = ll + (mid << 16)
    c0 = _u32(lo < ll)
    hi = hh + (mid >> 16) + (midc << 16) + c0
    return lo, hi


def _canon(lo, hi):
    ge = (hi == _U32MAX) & (lo != 0)
    lo2 = jnp.where(ge, lo - np.uint32(1), lo)
    hi2 = jnp.where(ge, jnp.zeros_like(hi), hi)
    return lo2, hi2


def _reduce128(r0, r1, r2, r3):
    """r0 + r1*2^32 + r2*2^64 + r3*2^96 mod p (2^64 = EPS, 2^96 = -1).

    Returns a residue in [0, 2^64) — NOT normalized below p (deferred
    canonicalization; see module docstring)."""
    s_lo = r0 - r3
    b0 = _u32(r0 < r3)
    s_hi = r1 - b0
    brw = _u32(r1 < b0)
    t0lo = s_lo - brw * _EPS
    t0hi = s_hi - _u32(s_lo < t0lo)
    t1lo = jnp.zeros_like(r2) - r2
    t1hi = r2 - _u32(r2 != 0)
    lo = t0lo + t1lo
    c0 = _u32(lo < t0lo)
    hi1 = t0hi + t1hi
    c1 = _u32(hi1 < t0hi)
    hi = hi1 + c0
    c2 = _u32(hi < hi1)
    carry = c1 | c2
    lo2 = lo + carry * _EPS
    hi2 = hi + _u32(lo2 < lo)
    return lo2, hi2


def _reduce96(r0, r1, r2):
    """r0 + r1*2^32 + r2*2^64 mod p with small r2 (< 2^31); in [0, 2^64)."""
    t1lo = jnp.zeros_like(r2) - r2
    t1hi = r2 - _u32(r2 != 0)
    lo = r0 + t1lo
    c0 = _u32(lo < r0)
    hi1 = r1 + t1hi
    c1 = _u32(hi1 < r1)
    hi = hi1 + c0
    c2 = _u32(hi < hi1)
    carry = c1 | c2
    lo2 = lo + carry * _EPS
    hi2 = hi + _u32(lo2 < lo)
    return lo2, hi2


def _gl_mul(a, b):
    alo, ahi = a
    blo, bhi = b
    p00l, p00h = _mul32(alo, blo)
    p01l, p01h = _mul32(alo, bhi)
    p10l, p10h = _mul32(ahi, blo)
    p11l, p11h = _mul32(ahi, bhi)
    r0 = p00l
    c1a = p00h + p01l
    k1a = _u32(c1a < p00h)
    r1 = c1a + p10l
    k1b = _u32(r1 < c1a)
    c2a = p01h + p10h
    k2a = _u32(c2a < p01h)
    c2b = c2a + p11l
    k2b = _u32(c2b < c2a)
    r2 = c2b + (k1a + k1b)
    k2c = _u32(r2 < c2b)
    r3 = p11h + (k2a + k2b + k2c)
    return _reduce128(r0, r1, r2, r3)


def _gl_sqr(a):
    """a*a with the symmetric cross-product computed once and doubled."""
    alo, ahi = a
    p00l, p00h = _mul32(alo, alo)
    p01l, p01h = _mul32(alo, ahi)
    p11l, p11h = _mul32(ahi, ahi)
    # 2*p01 is a 65-bit value at offset 32: its top bit lands at bit 96
    top = p01h >> 31
    d01h = (p01h << 1) | (p01l >> 31)
    d01l = p01l << 1
    r0 = p00l
    r1 = p00h + d01l
    k1 = _u32(r1 < p00h)
    c2a = p11l + d01h
    k2a = _u32(c2a < p11l)
    r2 = c2a + k1
    k2b = _u32(r2 < c2a)
    r3 = p11h + (k2a + k2b + top)
    return _reduce128(r0, r1, r2, r3)


def _gl_add(a, b):
    alo, ahi = a
    blo, bhi = b
    lo = alo + blo
    c = _u32(lo < alo)
    hi1 = ahi + bhi
    hi = hi1 + c
    carry = _u32(hi1 < ahi) | _u32(hi < hi1)
    lo2 = lo + carry * _EPS
    hi2 = hi + _u32(lo2 < lo)
    return lo2, hi2


def _pow7(a):
    a2 = _gl_sqr(a)
    a4 = _gl_sqr(a2)
    a3 = _gl_mul(a2, a)
    return _gl_mul(a3, a4)


_M22 = np.uint32(0x3FFFFF)


def _mds_lanes(lanes):
    """Circulant+diagonal MDS, unrolled over static lane indices.

    lanes: list of 12 (lo, hi) pairs in [0, 2^64).  Splits each element
    into three 22-bit limbs (x2 < 2^20) and accumulates CIRC[d] *
    lane[(i+d)%12] per output lane in three uint32 accumulators: with
    sum(CIRC) + diag = 272 < 2^9, acc0/acc1 < 2^31 and acc2 < 2^29.
    """
    limbs = []
    for (lo, hi) in lanes:
        limbs.append((
            lo & _M22,
            (lo >> 22) | ((hi & np.uint32(0xFFF)) << 10),
            hi >> 12,
        ))
    diag = np.uint32(MDS_DIAG[0])
    out = []
    for i in range(WIDTH):
        acc = [None, None, None]
        for d in range(WIDTH):
            c = np.uint32(MDS_CIRC[d])
            src = limbs[(i + d) % WIDTH]
            for k in range(3):
                term = src[k] * c
                acc[k] = term if acc[k] is None else acc[k] + term
        if i == 0:
            for k in range(3):
                acc[k] = acc[k] + limbs[0][k] * diag
        # recombine acc0 + acc1*2^22 + acc2*2^44 into (r0, r1, r2<2^10)
        r0 = acc[0] + (acc[1] << 22)
        c0 = _u32(r0 < acc[0])
        m1 = (acc[1] >> 10) + c0
        r1 = m1 + (acc[2] << 12)
        c1 = _u32(r1 < m1)
        r2 = (acc[2] >> 20) + c1
        out.append(_reduce96(r0, r1, r2))
    return out


def _rounds(lanes, rc_lo_ref, rc_hi_ref):
    """All 30 rounds over a 12-lane state (three fori_loop segments)."""

    def seg_body(full):
        def body(r, flat):
            lanes = [(flat[2 * i], flat[2 * i + 1]) for i in range(WIDTH)]
            lanes = [
                _gl_add(lanes[i], (rc_lo_ref[r, i], rc_hi_ref[r, i]))
                for i in range(WIDTH)
            ]
            if full:
                lanes = [_pow7(l) for l in lanes]
            else:
                lanes = [_pow7(lanes[0])] + lanes[1:]
            lanes = _mds_lanes(lanes)
            return tuple(x for l in lanes for x in l)

        return body

    flat = tuple(x for l in lanes for x in l)
    flat = jax.lax.fori_loop(0, _HALF_F, seg_body(True), flat)
    flat = jax.lax.fori_loop(_HALF_F, _HALF_F + N_PARTIAL_ROUNDS,
                             seg_body(False), flat)
    flat = jax.lax.fori_loop(_HALF_F + N_PARTIAL_ROUNDS, N_ROUNDS,
                             seg_body(True), flat)
    # rounds run with deferred canonicalization; normalize below p once here
    return [_canon(flat[2 * i], flat[2 * i + 1]) for i in range(WIDTH)]


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _permute_kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref,
                    out_lo_ref, out_hi_ref):
    lanes = [(lo_ref[i], hi_ref[i]) for i in range(WIDTH)]
    lanes = _rounds(lanes, rc_lo_ref, rc_hi_ref)
    for i in range(WIDTH):
        out_lo_ref[i] = lanes[i][0]
        out_hi_ref[i] = lanes[i][1]


def _linear_hash_kernel(n_chunks: int):
    """Sponge over (n_chunks*RATE, R, 128) column-major rows -> (4, R, 128)."""

    def kernel(rc_lo_ref, rc_hi_ref, src_lo_ref, src_hi_ref,
               out_lo_ref, out_hi_ref):
        zero = jnp.zeros(src_lo_ref.shape[1:], jnp.uint32)

        def chunk_body(c, dig):
            base = c * RATE
            lanes = [(src_lo_ref[base + j], src_hi_ref[base + j])
                     for j in range(RATE)]
            lanes += [(dig[2 * i], dig[2 * i + 1]) for i in range(CAPACITY)]
            lanes = _rounds(lanes, rc_lo_ref, rc_hi_ref)
            return tuple(x for l in lanes[:CAPACITY] for x in l)

        dig = tuple(zero for _ in range(2 * CAPACITY))
        dig = jax.lax.fori_loop(0, n_chunks, chunk_body, dig)
        for i in range(CAPACITY):
            out_lo_ref[i] = dig[2 * i]
            out_hi_ref[i] = dig[2 * i + 1]

    return kernel


def _node_hash_kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref,
                      out_lo_ref, out_hi_ref):
    zero = jnp.zeros((R_SUB, 128), jnp.uint32)
    lanes = [(lo_ref[i], hi_ref[i]) for i in range(2 * HASH_SIZE)]
    lanes += [(zero, zero) for _ in range(CAPACITY)]
    lanes = _rounds(lanes, rc_lo_ref, rc_hi_ref)
    for i in range(HASH_SIZE):
        out_lo_ref[i] = lanes[i][0]
        out_hi_ref[i] = lanes[i][1]


# ---------------------------------------------------------------------------
# pallas_call wrappers (cached per shape)
# ---------------------------------------------------------------------------


def _lanes_spec(n_lanes, r_sub=R_SUB):
    return pl.BlockSpec((n_lanes, r_sub, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _rc_specs():
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]


@functools.lru_cache(maxsize=None)
def _permute_call(n_tiles: int, interpret: bool):
    def fn(lo, hi):
        return pl.pallas_call(
            _permute_kernel,
            grid=(n_tiles,),
            interpret=interpret,
            in_specs=_rc_specs() + [_lanes_spec(WIDTH), _lanes_spec(WIDTH)],
            out_specs=[_lanes_spec(WIDTH), _lanes_spec(WIDTH)],
            out_shape=[
                jax.ShapeDtypeStruct(lo.shape, jnp.uint32),
                jax.ShapeDtypeStruct(hi.shape, jnp.uint32),
            ],
        )(jnp.asarray(_RC_LO), jnp.asarray(_RC_HI), lo, hi)

    def traced(lo, hi):
        with jax.enable_x64(False):
            return fn(lo, hi)

    return jax.jit(traced)


@functools.lru_cache(maxsize=None)
def _linear_hash_call(n_chunks: int, n_tiles: int, interpret: bool,
                      r_sub: int = R_SUB):
    w = n_chunks * RATE

    def fn(lo, hi):
        return pl.pallas_call(
            _linear_hash_kernel(n_chunks),
            grid=(n_tiles,),
            interpret=interpret,
            in_specs=_rc_specs() + [_lanes_spec(w, r_sub),
                                    _lanes_spec(w, r_sub)],
            out_specs=[_lanes_spec(CAPACITY, r_sub),
                       _lanes_spec(CAPACITY, r_sub)],
            out_shape=[
                jax.ShapeDtypeStruct((CAPACITY, n_tiles * r_sub, 128),
                                     jnp.uint32),
                jax.ShapeDtypeStruct((CAPACITY, n_tiles * r_sub, 128),
                                     jnp.uint32),
            ],
        )(jnp.asarray(_RC_LO), jnp.asarray(_RC_HI), lo, hi)

    def traced(lo, hi):
        with jax.enable_x64(False):
            return fn(lo, hi)

    return jax.jit(traced)


@functools.lru_cache(maxsize=None)
def _node_hash_call(n_tiles: int, interpret: bool):
    def fn(lo, hi):
        return pl.pallas_call(
            _node_hash_kernel,
            grid=(n_tiles,),
            interpret=interpret,
            in_specs=_rc_specs() + [_lanes_spec(2 * HASH_SIZE),
                                    _lanes_spec(2 * HASH_SIZE)],
            out_specs=[_lanes_spec(HASH_SIZE), _lanes_spec(HASH_SIZE)],
            out_shape=[
                jax.ShapeDtypeStruct((HASH_SIZE, n_tiles * R_SUB, 128),
                                     jnp.uint32),
                jax.ShapeDtypeStruct((HASH_SIZE, n_tiles * R_SUB, 128),
                                     jnp.uint32),
            ],
        )(jnp.asarray(_RC_LO), jnp.asarray(_RC_HI), lo, hi)

    def traced(lo, hi):
        with jax.enable_x64(False):
            return fn(lo, hi)

    return jax.jit(traced)


# ---------------------------------------------------------------------------
# Public drivers (shape glue in XLA, hashing in Pallas)
# ---------------------------------------------------------------------------


def _to_tiles(x, n_lanes, r_sub=R_SUB):
    """(n_lanes, B) -> (n_lanes, Bp/128, 128) with B padded to r_sub*128."""
    b = x.shape[1]
    pad = (-b) % (r_sub * 128)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x.reshape(n_lanes, (b + pad) // 128, 128), b


def _from_tiles(x, b):
    return x.reshape(x.shape[0], -1)[:, :b]


def permute_tpu(state: GL, interpret: bool = False) -> GL:
    """Poseidon permutation of a (12, B) GL state via the Pallas kernel."""
    assert state.shape[0] == WIDTH
    lo, b = _to_tiles(state.lo, WIDTH)
    hi, _ = _to_tiles(state.hi, WIDTH)
    n_tiles = lo.shape[1] // R_SUB
    out_lo, out_hi = _permute_call(n_tiles, interpret)(lo, hi)
    return GL(_from_tiles(out_lo, b), _from_tiles(out_hi, b))


def linear_hash_tpu(rows: GL, interpret: bool = False) -> GL:
    """(H, W) rows -> (H, 4) digests; same semantics as
    poseidon_gl.linear_hash (reference PoseidonGoldilocks::linear_hash)."""
    h, w = rows.shape
    if w <= CAPACITY:
        pad = CAPACITY - w
        return GL(
            jnp.pad(rows.lo, ((0, 0), (0, pad))),
            jnp.pad(rows.hi, ((0, 0), (0, pad))),
        )
    n_chunks = -(-w // RATE)
    wpad = n_chunks * RATE
    r_sub = _r_sub_for(wpad)
    lo = jnp.pad(rows.lo, ((0, 0), (0, wpad - w))).T  # (Wpad, H)
    hi = jnp.pad(rows.hi, ((0, 0), (0, wpad - w))).T
    lo, b = _to_tiles(lo, wpad, r_sub)
    hi, _ = _to_tiles(hi, wpad, r_sub)
    n_tiles = lo.shape[1] // r_sub
    out_lo, out_hi = _linear_hash_call(n_chunks, n_tiles, interpret,
                                       r_sub)(lo, hi)
    return GL(_from_tiles(out_lo, b).T, _from_tiles(out_hi, b).T)


def node_hash_tpu(left: GL, right: GL, interpret: bool = False) -> GL:
    """Parent digests of (n, 4) left/right child digests."""
    n = left.shape[0]
    lo = jnp.concatenate([left.lo.T, right.lo.T], axis=0)  # (8, n)
    hi = jnp.concatenate([left.hi.T, right.hi.T], axis=0)
    lo, b = _to_tiles(lo, 2 * HASH_SIZE)
    hi, _ = _to_tiles(hi, 2 * HASH_SIZE)
    n_tiles = lo.shape[1] // R_SUB
    out_lo, out_hi = _node_hash_call(n_tiles, interpret)(lo, hi)
    return GL(_from_tiles(out_lo, b).T, _from_tiles(out_hi, b).T)


_SMALL_LEVEL = 2048  # below this, the jnp path is cheaper than pad-to-tile


def merkle_nodes_tpu(leaves: GL, interpret: bool = False) -> GL:
    """All levels above (h, 4) leaf digests, root last — identical layout to
    poseidon_gl.merkle_nodes (reference merkleTreeGL.hpp:24-41)."""
    from . import poseidon_gl

    levels = []
    cur = leaves
    while cur.shape[0] > 1:
        if cur.shape[0] >= _SMALL_LEVEL or interpret:
            cur = node_hash_tpu(cur[0::2], cur[1::2], interpret)
        else:
            cur = poseidon_gl.node_hash(cur[0::2], cur[1::2])
        levels.append(cur)
    if not levels:
        return GL(jnp.zeros((0, 4), jnp.uint32), jnp.zeros((0, 4), jnp.uint32))
    return GL(
        jnp.concatenate([l.lo for l in levels], axis=0),
        jnp.concatenate([l.hi for l in levels], axis=0),
    )


def merkelize_tpu(source: GL, interpret: bool = False) -> GL:
    """Full (2h-1, 4) Poseidon Merkle tree of an (h, w) source matrix."""
    leaves = linear_hash_tpu(source, interpret)
    upper = merkle_nodes_tpu(leaves, interpret)
    return GL(
        jnp.concatenate([leaves.lo, upper.lo], axis=0),
        jnp.concatenate([leaves.hi, upper.hi], axis=0),
    )


def available() -> bool:
    if not HAVE_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False

"""Pallas TPU kernel for the Poseidon-Goldilocks permutation.

The jnp formulation (ops/poseidon_gl.py) expresses field ops through u64
emulation and materializes every round; this kernel keeps the whole
30-round permutation in VMEM on explicit 32-bit lanes:

  * state block (12, BLK) x {lo, hi} uint32 resident in VMEM,
  * field multiply via 16-bit half-word products (4 VPU int multiplies)
    and the 2^64 = 2^32 - 1 reduction,
  * the circulant MDS as sublane rolls + small-constant scaling in 16-bit
    limb space,
  * all 30 rounds fused — one HBM read and one write per element for the
    entire permutation instead of per-round traffic.

Falls back to the jnp path automatically when Pallas/TPU is unavailable
(`permute_best`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .goldilocks import EPSILON, GL, P
from .poseidon_constants import (
    MDS_CIRC,
    MDS_DIAG,
    N_FULL_ROUNDS,
    N_PARTIAL_ROUNDS,
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
    midc = (mid < lh).astype(jnp.uint32)
    lo = ll + (mid << 16)
    c0 = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> 16) + (midc << 16) + c0
    return lo, hi


def _reduce128(r0, r1, r2, r3):
    """r0 + r1*2^32 + r2*2^64 + r3*2^96 mod p, canonical.

    Exact mirror of ops/goldilocks._reduce128 (2^64 = EPSILON, 2^96 = -1).
    """
    # t0 = (r0, r1) - (r3, 0); borrow => subtract EPSILON
    s_lo = r0 - r3
    b0 = (r0 < r3).astype(jnp.uint32)
    s_hi1 = r1
    s_hi = s_hi1 - b0
    brw = (s_hi1 < b0).astype(jnp.uint32)
    t0lo2 = s_lo - brw * _EPS
    t0hi2 = s_hi - (s_lo < t0lo2).astype(jnp.uint32)
    # t1 = r2 * EPSILON = (r2 << 32) - r2
    t1lo = jnp.zeros_like(r2) - r2
    t1hi = r2 - (r2 != 0).astype(jnp.uint32)
    # t2 = t0 + t1; carry => add EPSILON
    lo = t0lo2 + t1lo
    c0 = (lo < t0lo2).astype(jnp.uint32)
    hi1 = t0hi2 + t1hi
    c1 = (hi1 < t0hi2).astype(jnp.uint32)
    hi = hi1 + c0
    c2 = (hi < hi1).astype(jnp.uint32)
    carry = c1 | c2
    lo2 = lo + carry * _EPS
    hi2 = hi + (lo2 < lo).astype(jnp.uint32)
    # canonical subtract of p
    ge = (hi2 == _U32MAX) & (lo2 != 0)
    lo3 = jnp.where(ge, lo2 - np.uint32(1), lo2)
    hi3 = jnp.where(ge, jnp.zeros_like(hi2), hi2)
    return lo3, hi3


def _gl_mul(alo, ahi, blo, bhi):
    p00l, p00h = _mul32(alo, blo)
    p01l, p01h = _mul32(alo, bhi)
    p10l, p10h = _mul32(ahi, blo)
    p11l, p11h = _mul32(ahi, bhi)
    r0 = p00l
    c1a = p00h + p01l
    k1a = (c1a < p00h).astype(jnp.uint32)
    r1 = c1a + p10l
    k1b = (r1 < c1a).astype(jnp.uint32)
    c2a = p01h + p10h
    k2a = (c2a < p01h).astype(jnp.uint32)
    c2b = c2a + p11l
    k2b = (c2b < c2a).astype(jnp.uint32)
    r2 = c2b + (k1a + k1b)
    k2c = (r2 < c2b).astype(jnp.uint32)
    r3 = p11h + (k2a + k2b + k2c)
    return _reduce128(r0, r1, r2, r3)


def _gl_add(alo, ahi, blo, bhi):
    lo = alo + blo
    c = (lo < alo).astype(jnp.uint32)
    hi1 = ahi + bhi
    hi = hi1 + c
    carry = ((hi1 < ahi) | (hi < hi1)).astype(jnp.uint32)
    lo2 = lo + carry * _EPS
    hi2 = hi + (lo2 < lo).astype(jnp.uint32)
    ge = (hi2 == _U32MAX) & (lo2 != 0)
    lo3 = jnp.where(ge, lo2 - np.uint32(1), lo2)
    hi3 = jnp.where(ge, jnp.zeros_like(hi2), hi2)
    return lo3, hi3


def _pow7(lo, hi):
    l2, h2 = _gl_mul(lo, hi, lo, hi)
    l4, h4 = _gl_mul(l2, h2, l2, h2)
    l3, h3 = _gl_mul(l2, h2, lo, hi)
    return _gl_mul(l3, h3, l4, h4)


def _mds(lo, hi):
    """Circulant MDS in 16-bit limb space on (12, BLK) blocks."""
    limbs = [lo & _M16, lo >> 16, hi & _M16, hi >> 16]
    acc = [None] * 4
    for d in range(WIDTH):
        c = np.uint32(MDS_CIRC[d])
        for k in range(4):
            rolled = limbs[k] if d == 0 else pltpu.roll(limbs[k], WIDTH - d, axis=0)
            term = rolled * c
            acc[k] = term if acc[k] is None else acc[k] + term
    diag = np.uint32(MDS_DIAG[0])
    mask = jax.lax.broadcasted_iota(jnp.uint32, lo.shape, 0) == 0
    for k in range(4):
        acc[k] = acc[k] + jnp.where(mask, limbs[k] * diag, 0)
    d0 = acc[0] & _M16
    t1 = acc[1] + (acc[0] >> 16)
    d1 = t1 & _M16
    t2 = acc[2] + (t1 >> 16)
    d2 = t2 & _M16
    t3 = acc[3] + (t2 >> 16)
    d3 = t3 & _M16
    d4 = t3 >> 16
    r0 = d0 | (d1 << 16)
    r1 = d2 | (d3 << 16)
    return _reduce128(r0, r1, d4, jnp.zeros_like(d4))


def _rc_tables():
    vals = [ROUND_CONSTANTS[i] % P for i in range(N_ROUNDS * WIDTH)]
    lo = np.array([v & 0xFFFFFFFF for v in vals],
                  dtype=np.uint32).reshape(N_ROUNDS, WIDTH)
    hi = np.array([v >> 32 for v in vals],
                  dtype=np.uint32).reshape(N_ROUNDS, WIDTH)
    return lo, hi


def _permute_kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref,
                    out_lo_ref, out_hi_ref):
    # rounds rolled as fori_loops (full / partial / full) so the Mosaic
    # lowering sees one round body per segment, not 30 unrolled rounds
    def round_body(full):
        def body(r, carry):
            lo, hi = carry
            clo = rc_lo_ref[r, :].reshape(WIDTH, 1)
            chi = rc_hi_ref[r, :].reshape(WIDTH, 1)
            lo, hi = _gl_add(lo, hi, jnp.broadcast_to(clo, lo.shape),
                             jnp.broadcast_to(chi, hi.shape))
            if full:
                lo, hi = _pow7(lo, hi)
            else:
                s_lo, s_hi = _pow7(lo[0:1], hi[0:1])
                lo = jnp.concatenate([s_lo, lo[1:]], axis=0)
                hi = jnp.concatenate([s_hi, hi[1:]], axis=0)
            lo, hi = _mds(lo, hi)
            return (lo, hi)

        return body

    carry = (lo_ref[:], hi_ref[:])
    carry = jax.lax.fori_loop(0, _HALF_F, round_body(True), carry)
    carry = jax.lax.fori_loop(_HALF_F, _HALF_F + N_PARTIAL_ROUNDS,
                              round_body(False), carry)
    carry = jax.lax.fori_loop(_HALF_F + N_PARTIAL_ROUNDS, N_ROUNDS,
                              round_body(True), carry)
    out_lo_ref[:] = carry[0]
    out_hi_ref[:] = carry[1]


@functools.lru_cache(maxsize=None)
def _permute_pallas_fn(block: int, interpret: bool = False):
    def fn(lo, hi):
        n = lo.shape[1]
        grid = (n // block,)
        rc_lo, rc_hi = _rc_tables()
        return _call(rc_lo, rc_hi, lo, hi, n, grid)

    def _call(rc_lo, rc_hi, lo, hi, n, grid):
        return pl.pallas_call(
            _permute_kernel,
            grid=grid,
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((N_ROUNDS, WIDTH), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_ROUNDS, WIDTH), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WIDTH, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WIDTH, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((WIDTH, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WIDTH, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(lo.shape, jnp.uint32),
                jax.ShapeDtypeStruct(hi.shape, jnp.uint32),
            ],
        )(jnp.asarray(rc_lo), jnp.asarray(rc_hi), lo, hi)

    def traced(lo, hi):
        # weak 64-bit literal promotion under jax_enable_x64 sends Mosaic's
        # convert-element-type lowering into unbounded recursion; trace the
        # kernel with x64 off (all kernel dtypes are explicit uint32)
        with jax.enable_x64(False):
            return fn(lo, hi)

    return jax.jit(traced)


def permute_pallas(state: GL, block: int = 512,
                   interpret: bool = False) -> GL:
    """Poseidon permutation of a (12, B) GL state via the Pallas kernel.

    B is padded to a multiple of `block` internally.  `interpret=True`
    runs the kernel in the Pallas interpreter (CPU) — used by the test
    suite to pin the kernel semantics; Mosaic TPU compilation of the
    rolled round loop is still experimental in this environment.
    """
    assert state.shape[0] == WIDTH
    n = state.shape[1]
    pad = (-n) % block
    lo = jnp.pad(state.lo, ((0, 0), (0, pad)))
    hi = jnp.pad(state.hi, ((0, 0), (0, pad)))
    out_lo, out_hi = _permute_pallas_fn(block, interpret)(lo, hi)
    return GL(out_lo[:, :n], out_hi[:, :n])


def permute_available() -> bool:
    if not HAVE_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False

"""Goldilocks field (p = 2^64 - 2^32 + 1) arithmetic on 2x uint32 limbs.

TPU-native design: the TPU VPU has no 64-bit integer datapath, so every field
element is a pair of uint32 arrays (lo, hi).  All operations are pure
elementwise jnp functions that vectorize over arbitrary leading shapes, fuse
under jit, and run bit-exactly on both the TPU and CPU backends.

Semantics mirror the reference prover's Goldilocks library API (the
`src/goldilocks` submodule of MerlinLayer2/merlin-zkevm-prover, used via
`Goldilocks::add/sub/mul/inv/exp/shift/w`, see reference
src/starkpil/starks.cpp and src/starkpil/polinomial.hpp call sites), but the
implementation is built from scratch for 32-bit lanes:

  * 32x32->64 products via 16-bit half-word decomposition (4 VPU muls),
  * 128-bit -> 64-bit reduction using 2^64 = 2^32 - 1 and 2^96 = -1 (mod p),
  * all results kept canonical (< p) at op boundaries.

The two-adic root-of-unity table W and the coset shift follow the reference
conventions (W[k] = g^((p-1)/2^k) with g = 7 the smallest multiplicative
generator; shift = 49 = 7^2), matching `Goldilocks::w(nBits)` and
`Goldilocks::shift()` used in reference src/starkpil/starks.hpp:149-160.
"""

from __future__ import annotations

import functools
import sys
from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Field constants (host-side python ints)
# ---------------------------------------------------------------------------

P = (1 << 64) - (1 << 32) + 1
EPSILON = (1 << 32) - 1  # 2^64 mod p
GENERATOR = 7  # smallest generator of the multiplicative group
TWO_ADICITY = 32

# W[k] = primitive 2^k-th root of unity, W[k] = W[k+1]^2.
_W = [0] * (TWO_ADICITY + 1)
_W[TWO_ADICITY] = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)
for _k in range(TWO_ADICITY - 1, -1, -1):
    _W[_k] = (_W[_k + 1] * _W[_k + 1]) % P
assert _W[0] == 1 and _W[1] == P - 1 and _W[2] == 1 << 48

# Coset generator used for the extended (LDE) evaluation domain,
# `Goldilocks::shift()` in the reference.
SHIFT = 49
SHIFT_INV = pow(SHIFT, P - 2, P)

# deep fused field-op graphs (unrolled Poseidon rounds, exp chains) exceed
# the default interpreter recursion limit during tracing
sys.setrecursionlimit(max(sys.getrecursionlimit(), 100_000))

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)
_U32MAX = np.uint32(0xFFFFFFFF)


def w(nbits: int) -> int:
    """Primitive 2^nbits-th root of unity as a python int."""
    return _W[nbits]


def w_inv(nbits: int) -> int:
    return pow(_W[nbits], P - 2, P)


# ---------------------------------------------------------------------------
# The element container: a pytree of two uint32 arrays
# ---------------------------------------------------------------------------


class GL(NamedTuple):
    """A (batched) Goldilocks element: value = lo + 2^32 * hi, canonical < p."""

    lo: jax.Array  # uint32
    hi: jax.Array  # uint32

    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def __getitem__(self, idx):
        return GL(self.lo[idx], self.hi[idx])

    def reshape(self, *shape):
        return GL(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def astuple(self):
        return (self.lo, self.hi)


GLLike = Union[GL, int]


# ---------------------------------------------------------------------------
# Host <-> device conversions
# ---------------------------------------------------------------------------


def from_u64(x) -> GL:
    """numpy uint64 array (or python ints / lists) -> GL."""
    a = np.asarray(x, dtype=np.uint64)
    return GL(
        jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
    )


def to_u64(x: GL) -> np.ndarray:
    lo = np.asarray(jax.device_get(x.lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(x.hi), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def const(value: int, shape=()) -> GL:
    """Broadcastable device constant."""
    v = value % P
    return GL(
        jnp.full(shape, v & 0xFFFFFFFF, dtype=_U32),
        jnp.full(shape, v >> 32, dtype=_U32),
    )


def zeros(shape) -> GL:
    return GL(jnp.zeros(shape, _U32), jnp.zeros(shape, _U32))


def ones(shape) -> GL:
    return GL(jnp.ones(shape, _U32), jnp.zeros(shape, _U32))


def _coerce(x: GLLike, like: GL = None) -> GL:
    if isinstance(x, GL):
        return x
    return const(x)


# ---------------------------------------------------------------------------
# uint32 limb helpers
# ---------------------------------------------------------------------------


def _u32(x):
    return x.astype(_U32)


def _carry(a_plus_b, a):
    """Carry bit of uint32 wrap-around addition a+b, given the sum."""
    return _u32(a_plus_b < a)


def mul32(a, b) -> Tuple[jax.Array, jax.Array]:
    """Full 32x32 -> 64 product as (lo, hi) uint32, via 16-bit halves."""
    al = a & _MASK16
    ah = a >> 16
    bl = b & _MASK16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    midc = _u32(mid < lh)  # carry of lh + hl (weight 2^48)
    lo = ll + (mid << 16)
    c0 = _u32(lo < ll)
    hi = hh + (mid >> 16) + (midc << 16) + c0
    return lo, hi


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 plus carry-out bit."""
    lo = alo + blo
    c = _u32(lo < alo)
    hi1 = ahi + bhi
    c1 = _u32(hi1 < ahi)
    hi = hi1 + c
    c2 = _u32(hi < hi1)
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 plus borrow-out bit."""
    lo = alo - blo
    b0 = _u32(alo < blo)
    hi1 = ahi - bhi
    b1 = _u32(ahi < bhi)
    hi = hi1 - b0
    b2 = _u32(hi1 < b0)
    return lo, hi, b1 | b2


def _ge_p(lo, hi):
    """value >= p, for values < 2^64.  p = (1, 0xFFFFFFFF) in (lo, hi) limbs."""
    return (hi == _U32MAX) & (lo != 0)


def _canon(lo, hi) -> GL:
    """Conditional subtract of p for values < 2^64 (at most one subtract)."""
    ge = _ge_p(lo, hi)
    # value - p = (lo - 1, hi - 0xFFFFFFFF - borrow) ; since ge implies lo>=1,
    # there is no borrow: lo' = lo - 1, hi' = hi + 1 (mod 2^32) == 0.
    lo2 = jnp.where(ge, lo - np.uint32(1), lo)
    hi2 = jnp.where(ge, jnp.zeros_like(hi), hi)
    return GL(lo2, hi2)


# ---------------------------------------------------------------------------
# Field ops
# ---------------------------------------------------------------------------


# u64 fast path: XLA emulates 64-bit integers with 32-bit pairs internally
# on TPU, so doing the limb algebra in uint64 emits the same machine code
# while shrinking the traced graph ~10x (critical for compile times).
# Requires jax_enable_x64; the u32-pair path below is the fallback.


def _x64() -> bool:
    return jax.config.jax_enable_x64


def _pack(a: GL):
    return a.lo.astype(jnp.uint64) | (a.hi.astype(jnp.uint64) << np.uint64(32))


def _unpack(v) -> GL:
    return GL(
        (v & np.uint64(0xFFFFFFFF)).astype(_U32),
        (v >> np.uint64(32)).astype(_U32),
    )


_EPS64 = np.uint64(EPSILON)
_P64 = np.uint64(P)


def _canon64(v):
    return jnp.where(v >= _P64, v - _P64, v)


def _add_u64(a: GL, b: GL) -> GL:
    x = _pack(a)
    y = _pack(b)
    s = x + y
    c = (s < x).astype(jnp.uint64)
    s = s + c * _EPS64  # cannot re-wrap: a,b < p so s < 2^64 - 2^33 + 2
    return _unpack(_canon64(s))


def _sub_u64(a: GL, b: GL) -> GL:
    x = _pack(a)
    y = _pack(b)
    d = x - y
    brw = (x < y).astype(jnp.uint64)
    return _unpack(d - brw * _EPS64)


def _mul_u64(a: GL, b: GL) -> GL:
    al = a.lo.astype(jnp.uint64)
    ah = a.hi.astype(jnp.uint64)
    bl = b.lo.astype(jnp.uint64)
    bh = b.hi.astype(jnp.uint64)
    p00 = al * bl
    p01 = al * bh
    p10 = ah * bl
    p11 = ah * bh
    mid = p01 + p10
    midc = (mid < p01).astype(jnp.uint64)
    lo = p00 + (mid << np.uint64(32))
    c0 = (lo < p00).astype(jnp.uint64)
    hi = p11 + (mid >> np.uint64(32)) + (midc << np.uint64(32)) + c0
    # reduce 128 -> 64: 2^64 = EPSILON, 2^96 = -1 (mod p)
    hi_lo = hi & np.uint64(0xFFFFFFFF)
    hi_hi = hi >> np.uint64(32)
    b0 = (lo < hi_hi).astype(jnp.uint64)
    t0 = lo - hi_hi - b0 * _EPS64
    t1 = (hi_lo << np.uint64(32)) - hi_lo  # hi_lo * EPSILON < 2^64
    s = t0 + t1
    c = (s < t0).astype(jnp.uint64)
    s = s + c * _EPS64
    return _unpack(_canon64(s))


def add(a: GL, b: GLLike) -> GL:
    b = _coerce(b)
    if _x64():
        return _add_u64(a, b)
    lo, hi, c = _add64(a.lo, a.hi, b.lo, b.hi)
    # carry => value = s + 2^64 == s + EPSILON (mod p); s + EPSILON < 2^64 here
    # because a + b < 2p  =>  s < 2^64 - 2^33 + 2.
    lo2 = lo + (c * np.uint32(EPSILON & 0xFFFFFFFF))
    hi2 = hi + _u32(lo2 < lo)
    return _canon(lo2, hi2)


def sub(a: GL, b: GLLike) -> GL:
    b = _coerce(b)
    if _x64():
        return _sub_u64(a, b)
    lo, hi, brw = _sub64(a.lo, a.hi, b.lo, b.hi)
    # borrow => true value = wrapped - 2^64 + p = wrapped - EPSILON
    lo2 = lo - (brw * np.uint32(EPSILON & 0xFFFFFFFF))
    hi2 = hi - _u32(lo < lo2)
    return GL(lo2, hi2)


def neg(a: GL) -> GL:
    # p - a, except 0 -> 0
    z = (a.lo == 0) & (a.hi == 0)
    lo, hi, _ = _sub64(np.uint32(1), _U32MAX, a.lo, a.hi)  # p - a
    return GL(jnp.where(z, np.uint32(0), lo), jnp.where(z, np.uint32(0), hi))


def _reduce128(r0, r1, r2, r3) -> GL:
    """Reduce r0 + r1*2^32 + r2*2^64 + r3*2^96 (each uint32) mod p.

    Uses 2^64 = EPSILON, 2^96 = -1 (mod p).
    """
    # t0 = lo64 - r3  (borrow => subtract EPSILON)
    t0lo, t0hi, brw = _sub64(r0, r1, r3, jnp.zeros_like(r3))
    t0lo2 = t0lo - (brw * np.uint32(EPSILON & 0xFFFFFFFF))
    t0hi2 = t0hi - _u32(t0lo < t0lo2)
    # t1 = r2 * EPSILON = (r2 << 32) - r2
    t1lo = jnp.zeros_like(r2) - r2
    t1hi = r2 - _u32(r2 != 0)
    # t2 = t0 + t1  (carry => add EPSILON; cannot carry twice)
    lo, hi, c = _add64(t0lo2, t0hi2, t1lo, t1hi)
    lo2 = lo + (c * np.uint32(EPSILON & 0xFFFFFFFF))
    hi2 = hi + _u32(lo2 < lo)
    return _canon(lo2, hi2)


def mul(a: GL, b: GLLike) -> GL:
    b = _coerce(b)
    if _x64():
        return _mul_u64(a, b)
    # 128-bit schoolbook product in 4 uint32 columns
    p00l, p00h = mul32(a.lo, b.lo)
    p01l, p01h = mul32(a.lo, b.hi)
    p10l, p10h = mul32(a.hi, b.lo)
    p11l, p11h = mul32(a.hi, b.hi)

    r0 = p00l
    # column 1: p00h + p01l + p10l
    c1a = p00h + p01l
    k1a = _u32(c1a < p00h)
    r1 = c1a + p10l
    k1b = _u32(r1 < c1a)
    # column 2: p01h + p10h + p11l + carries(k1a+k1b)
    c2a = p01h + p10h
    k2a = _u32(c2a < p01h)
    c2b = c2a + p11l
    k2b = _u32(c2b < c2a)
    r2 = c2b + (k1a + k1b)
    k2c = _u32(r2 < c2b)
    # column 3: p11h + carries
    r3 = p11h + (k2a + k2b + k2c)
    return _reduce128(r0, r1, r2, r3)


def sqr(a: GL) -> GL:
    return mul(a, a)


def mul_small(a: GL, c: int) -> GL:
    """Multiply by a small (< 2^32) host constant."""
    if c == 0:
        return zeros(a.shape)
    if c == 1:
        return a
    cc = np.uint32(c)
    p0l, p0h = mul32(a.lo, cc)
    p1l, p1h = mul32(a.hi, cc)
    r0 = p0l
    r1 = p0h + p1l
    k = _u32(r1 < p0h)
    r2 = p1h + k
    return _reduce128(r0, r1, r2, jnp.zeros_like(r2))


def pow7(a: GL) -> GL:
    a2 = mul(a, a)
    a3 = mul(a2, a)
    a4 = mul(a2, a2)
    return mul(a3, a4)


def exp(a: GL, e: int) -> GL:
    """a^e for a static host exponent.

    Square-and-multiply as a lax.scan over the exponent bits: the graph is
    one squaring + one select regardless of exponent size (deep unrolled
    multiply chains are an XLA:CPU compile/runtime pathology, and on TPU
    the rolled form compiles faster with identical arithmetic cost).
    """
    e = e % (P - 1) if e >= P - 1 else e
    if e == 0:
        return ones(a.shape)
    nbits = e.bit_length()
    if nbits <= 4:
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else mul(result, base)
            e >>= 1
            if e:
                base = mul(base, base)
        return result
    bits = jnp.array([(e >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)

    def body(carry, bit):
        result, base = carry
        nxt = mul(result, base)
        result = select(bit != 0, nxt, result)
        base = mul(base, base)
        return (result, base), None

    (result, _), _ = jax.lax.scan(body, (ones(a.shape), a), bits)
    return result


def inv(a: GL) -> GL:
    """Fermat inverse a^(p-2).  Prefer batch_inverse for arrays."""
    return exp(a, P - 2)


def is_zero(a: GL) -> jax.Array:
    return (a.lo == 0) & (a.hi == 0)


def eq(a: GL, b: GL) -> jax.Array:
    return (a.lo == b.lo) & (a.hi == b.hi)


def select(pred, a: GL, b: GL) -> GL:
    return GL(jnp.where(pred, a.lo, b.lo), jnp.where(pred, a.hi, b.hi))


# ---------------------------------------------------------------------------
# Bulk helpers
# ---------------------------------------------------------------------------


def concat(parts, axis=0) -> GL:
    return GL(
        jnp.concatenate([p.lo for p in parts], axis=axis),
        jnp.concatenate([p.hi for p in parts], axis=axis),
    )


def stack(parts, axis=0) -> GL:
    return GL(
        jnp.stack([p.lo for p in parts], axis=axis),
        jnp.stack([p.hi for p in parts], axis=axis),
    )


def batch_inverse(a: GL, axis: int = -1) -> GL:
    """Montgomery batch inversion along `axis` via two cumulative-product scans.

    Mirrors Polinomial::batchInverse (reference src/starkpil/polinomial.hpp:698)
    but expressed as jax scans; zero inputs produce zero outputs.
    """
    if axis != 0:
        # move to axis 0
        lo = jnp.moveaxis(a.lo, axis, 0)
        hi = jnp.moveaxis(a.hi, axis, 0)
        r = batch_inverse(GL(lo, hi), axis=0)
        return GL(jnp.moveaxis(r.lo, 0, axis), jnp.moveaxis(r.hi, 0, axis))

    z = is_zero(a)
    aa = select(z, ones(a.shape), a)  # avoid 0 poisoning the products

    def fwd(carry, x):
        nxt = mul(carry, x)
        return nxt, carry  # prefix product EXCLUSIVE

    one = ones(a.shape[1:])
    total, pre = jax.lax.scan(fwd, one, aa)
    tinv = inv(total)

    def bwd(carry, xs):
        x, pexc = xs
        out = mul(carry, pexc)  # inverse of x
        nxt = mul(carry, x)
        return nxt, out

    _, out = jax.lax.scan(bwd, tinv, (aa, pre), reverse=True)
    return select(z, zeros(a.shape), out)


def sum_axis0(a: GL) -> GL:
    """Exact modular sum over axis 0 via log-depth halving (VPU-friendly)."""
    n = a.shape[0]
    if n == 0:
        return zeros(a.shape[1:])
    m = 1 << max((n - 1).bit_length(), 0)
    if m != n:
        pad = [(0, m - n)] + [(0, 0)] * (a.lo.ndim - 1)
        a = GL(jnp.pad(a.lo, pad), jnp.pad(a.hi, pad))
    while m > 1:
        m //= 2
        a = add(a[:m], a[m:])
    return a[0]


def powers(base: int, n: int, start: int = 1) -> GL:
    """Device array [start, start*base, ..., start*base^(n-1)] (host-computed)."""
    out = np.empty(n, dtype=np.uint64)
    cur = start % P
    b = base % P
    for i in range(n):
        out[i] = cur
        cur = (cur * b) % P
    return from_u64(out)


def powers_np(base: int, n: int, start: int = 1) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    cur = start % P
    b = base % P
    for i in range(n):
        out[i] = cur
        cur = (cur * b) % P
    return out

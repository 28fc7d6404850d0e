"""Vectorized 256-bit Montgomery field arithmetic (BN254 Fq / Fr).

Replaces the reference's generated x86-64 NASM Montgomery kernels
(reference src/ffiasm/fq.asm, fr.asm — 8,793 lines each) with a
limb-vectorized JAX formulation tuned for XLA:

  * elements are (..., 16) uint64 arrays of 16-bit limbs (little-endian);
  * Montgomery multiply is a lax.scan over the 16 limb iterations with
    DEFERRED carries — each step is two 16-wide vector multiplies and no
    carry chain (products and accumulators stay < 2^38 in the u64 lanes),
    one carry-propagation pass at the end;
  * deep chains (inversion, exponentiation) are scans over exponent bits.

Scalars for MSMs use a separate packed (..., 8) u64 32-bit-limb form
(`scalars_to_limbs`).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

N_LIMBS = 16
LIMB_BITS = 16
MASK = np.uint64(0xFFFF)

# BN254 (alt_bn128) moduli
Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R_MOD = 21888242871839275222246405745257275088548364400416034343698204186575808495617


class FpCtx(NamedTuple):
    mod: int
    mod_limbs: np.ndarray      # (16,) uint64, 16-bit limbs
    ninv16: int                # -mod^-1 mod 2^16
    r: int                     # 2^256 mod mod
    r2: int
    mont_one: np.ndarray


def _to_limbs_np(x: int) -> np.ndarray:
    return np.array(
        [(x >> (LIMB_BITS * i)) & 0xFFFF for i in range(N_LIMBS)],
        dtype=np.uint64,
    )


def _from_limbs_np(limbs) -> int:
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(limbs))


@functools.lru_cache(maxsize=None)
def make_ctx(mod: int) -> FpCtx:
    r = (1 << 256) % mod
    r2 = (r * r) % mod
    ninv16 = (-pow(mod, -1, 1 << 16)) % (1 << 16)
    return FpCtx(mod, _to_limbs_np(mod), ninv16, r, r2, _to_limbs_np(r))


FQ = make_ctx(Q)
FR = make_ctx(R_MOD)


# ---------------------------------------------------------------------------
# Host <-> device
# ---------------------------------------------------------------------------


def from_int(ctx: FpCtx, values) -> jnp.ndarray:
    """Python ints / object array -> Montgomery-form (..., 16) u64 device."""
    arr = np.asarray(values, dtype=object)
    flat = arr.reshape(-1)
    out = np.zeros((flat.shape[0], N_LIMBS), dtype=np.uint64)
    for i, v in enumerate(flat):
        out[i] = _to_limbs_np((int(v) * ctx.r) % ctx.mod)
    return jnp.asarray(out.reshape(arr.shape + (N_LIMBS,)))


def to_int(ctx: FpCtx, x) -> np.ndarray:
    """Montgomery device array -> object ndarray of python ints."""
    arr = np.asarray(jax.device_get(x), dtype=np.uint64)
    flat = arr.reshape(-1, N_LIMBS)
    rinv = pow(ctx.r, -1, ctx.mod)
    out = np.empty(flat.shape[0], dtype=object)
    for i in range(flat.shape[0]):
        out[i] = (_from_limbs_np(flat[i]) * rinv) % ctx.mod
    return out.reshape(arr.shape[:-1])


def zeros(shape) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (N_LIMBS,), dtype=jnp.uint64)


def mont_one(ctx: FpCtx, shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(
        jnp.asarray(ctx.mont_one), tuple(shape) + (N_LIMBS,)
    )


def scalars_to_limbs(vals: List[int]) -> jnp.ndarray:
    """Plain ints -> (n, 8) u64 32-bit limbs (MSM scalar format)."""
    out = np.zeros((len(vals), 8), dtype=np.uint64)
    for i, v in enumerate(vals):
        v = int(v)
        for j in range(8):
            out[i, j] = (v >> (32 * j)) & 0xFFFFFFFF
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------


def _ge(a, b) -> jnp.ndarray:
    """a >= b limbwise-lexicographic (most significant first)."""
    gt = jnp.zeros(a.shape[:-1], dtype=bool)
    eq_ = jnp.ones(a.shape[:-1], dtype=bool)
    for j in range(N_LIMBS - 1, -1, -1):
        gt = gt | (eq_ & (a[..., j] > b[..., j]))
        eq_ = eq_ & (a[..., j] == b[..., j])
    return gt | eq_


def _carry_prop(t):
    """Normalize (..., L) accumulators (< 2^48 each) to 16-bit limbs.

    Done as a scan over the limb axis (one tiny body, L steps).
    """
    tl = jnp.moveaxis(t, -1, 0)

    def body(carry, limb):
        s = limb + carry
        return s >> np.uint64(16), s & MASK

    _, out = jax.lax.scan(body, jnp.zeros(t.shape[:-1], jnp.uint64), tl)
    return jnp.moveaxis(out, 0, -1)


def _raw_add(a, b):
    s = _carry_prop(a + b)
    return s


def add(ctx: FpCtx, a, b):
    return _cond_sub_mod(ctx, _raw_add(a, b))


def _raw_sub(a, b):
    """a - b with borrow flag; scan over limbs."""
    al = jnp.moveaxis(a, -1, 0)
    bl = jnp.moveaxis(b, -1, 0)

    def body(borrow, ab):
        x, y = ab
        d = x - y - borrow
        wrapped = (d >> np.uint64(63)) & np.uint64(1)
        return wrapped, d & MASK

    borrow, out = jax.lax.scan(
        body, jnp.zeros(a.shape[:-1], jnp.uint64), (al, bl)
    )
    return jnp.moveaxis(out, 0, -1), borrow


def _cond_sub_mod(ctx: FpCtx, a):
    modb = jnp.broadcast_to(jnp.asarray(ctx.mod_limbs), a.shape)
    d, _ = _raw_sub(a, modb)
    ge = _ge(a, modb)
    return jnp.where(ge[..., None], d, a)


def sub(ctx: FpCtx, a, b):
    d, borrow = _raw_sub(a, b)
    corr = _carry_prop(
        d + jnp.broadcast_to(jnp.asarray(ctx.mod_limbs), d.shape)
    )
    return jnp.where(borrow[..., None] != 0, corr, d)


def neg(ctx: FpCtx, a):
    z = is_zero(a)
    d, _ = _raw_sub(jnp.broadcast_to(jnp.asarray(ctx.mod_limbs), a.shape), a)
    return jnp.where(z[..., None], a, d)


def is_zero(a) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a, b) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(pred, a, b):
    return jnp.where(pred[..., None], a, b)


def mont_mul(ctx: FpCtx, a, b):
    """Montgomery multiply with deferred carries.

    Per limb iteration i (scanned): t += a_i * b; m = t_0 * ninv mod 2^16;
    t += m * mod; t >>= 16.  Accumulators stay < 2^38, so no intra-step
    carry chains are needed; one carry propagation at the end.
    """
    ninv = np.uint64(ctx.ninv16)
    modv = jnp.asarray(ctx.mod_limbs)
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    bb = jnp.broadcast_to(b, shape + (N_LIMBS,))
    al = jnp.moveaxis(jnp.broadcast_to(a, shape + (N_LIMBS,)), -1, 0)

    def body(t, ai):
        t = t + ai[..., None] * bb
        m = (t[..., 0] * ninv) & MASK
        t = t + m[..., None] * modv
        # shift one limb down; the dropped limb is divisible by 2^16
        carry = t[..., 0] >> np.uint64(16)
        t = jnp.concatenate(
            [t[..., 1:], jnp.zeros(shape + (1,), jnp.uint64)], axis=-1
        )
        t = t.at[..., 0].add(carry)
        return t, None

    t, _ = jax.lax.scan(body, jnp.zeros(shape + (N_LIMBS,), jnp.uint64), al)
    res = _carry_prop(t)
    return _cond_sub_mod(ctx, res)


def mont_sqr(ctx: FpCtx, a):
    return mont_mul(ctx, a, a)


def exp_scan(ctx: FpCtx, a, e: int):
    """a^e (Montgomery in/out) via scan over exponent bits."""
    if e == 0:
        return mont_one(ctx, a.shape[:-1])
    nbits = e.bit_length()
    bits = jnp.array([(e >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)

    def body(carry, bit):
        result, base = carry
        nxt = mont_mul(ctx, result, base)
        result = jnp.where(bit != 0, nxt, result)
        base = mont_mul(ctx, base, base)
        return (result, base), None

    (result, _), _ = jax.lax.scan(body, (mont_one(ctx, a.shape[:-1]), a), bits)
    return result


def inv(ctx: FpCtx, a):
    """Fermat inverse (Montgomery in/out)."""
    return exp_scan(ctx, a, ctx.mod - 2)
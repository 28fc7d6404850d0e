"""alt_bn128 (BN254) curve arithmetic, vectorized Jacobian coordinates.

Replaces the reference's curve templates + asm field kernels
(src/ffiasm/curve.c.hpp, alt_bn128.cpp) with select-based complete-enough
Jacobian formulas over a generic field interface, so G1 (Fq) and G2 (Fq2)
share one implementation.  Points are pytrees {x, y, z}; z == 0 encodes
infinity.  All ops vectorize over leading shapes and are safe inside
lax.scan bodies (the MSM combiner).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bn254_field as bf
from ..ops.bn254_field import FQ, FR


class F1:
    """Base-field interface over Fq."""

    ctx = FQ

    @staticmethod
    def mul(a, b):
        return bf.mont_mul(FQ, a, b)

    @staticmethod
    def add(a, b):
        return bf.add(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return bf.sub(FQ, a, b)

    @staticmethod
    def neg(a):
        return bf.neg(FQ, a)

    @staticmethod
    def sqr(a):
        return bf.mont_mul(FQ, a, a)

    @staticmethod
    def is_zero(a):
        return bf.is_zero(a)

    @staticmethod
    def select(p, a, b):
        return bf.select(p, a, b)

    @staticmethod
    def zeros(shape):
        return bf.zeros(shape)

    @staticmethod
    def one(shape=()):
        return bf.mont_one(FQ, shape)

    @staticmethod
    def inv(a):
        return bf.inv(FQ, a)

    @staticmethod
    def from_int(v):
        return bf.from_int(FQ, v)

    @staticmethod
    def to_int(a):
        return bf.to_int(FQ, a)


class Fq2El(NamedTuple):
    c0: jnp.ndarray
    c1: jnp.ndarray


class F2:
    """Quadratic extension Fq2 = Fq[u]/(u^2 + 1)."""

    @staticmethod
    def mul(a: Fq2El, b: Fq2El) -> Fq2El:
        t0 = bf.mont_mul(FQ, a.c0, b.c0)
        t1 = bf.mont_mul(FQ, a.c1, b.c1)
        t2 = bf.mont_mul(FQ, bf.add(FQ, a.c0, a.c1), bf.add(FQ, b.c0, b.c1))
        return Fq2El(
            bf.sub(FQ, t0, t1),
            bf.sub(FQ, bf.sub(FQ, t2, t0), t1),
        )

    @staticmethod
    def add(a, b):
        return Fq2El(bf.add(FQ, a.c0, b.c0), bf.add(FQ, a.c1, b.c1))

    @staticmethod
    def sub(a, b):
        return Fq2El(bf.sub(FQ, a.c0, b.c0), bf.sub(FQ, a.c1, b.c1))

    @staticmethod
    def neg(a):
        return Fq2El(bf.neg(FQ, a.c0), bf.neg(FQ, a.c1))

    @staticmethod
    def sqr(a):
        return F2.mul(a, a)

    @staticmethod
    def is_zero(a):
        return bf.is_zero(a.c0) & bf.is_zero(a.c1)

    @staticmethod
    def select(p, a, b):
        return Fq2El(bf.select(p, a.c0, b.c0), bf.select(p, a.c1, b.c1))

    @staticmethod
    def zeros(shape):
        return Fq2El(bf.zeros(shape), bf.zeros(shape))

    @staticmethod
    def one(shape=()):
        return Fq2El(bf.mont_one(FQ, shape), bf.zeros(shape))

    @staticmethod
    def inv(a):
        # 1/(c0 + c1 u) = (c0 - c1 u) / (c0^2 + c1^2)
        norm = bf.add(FQ, bf.mont_mul(FQ, a.c0, a.c0),
                      bf.mont_mul(FQ, a.c1, a.c1))
        ninv = bf.inv(FQ, norm)
        return Fq2El(bf.mont_mul(FQ, a.c0, ninv),
                     bf.mont_mul(FQ, bf.neg(FQ, a.c1), ninv))

    @staticmethod
    def from_int(pair):
        c0, c1 = pair
        return Fq2El(bf.from_int(FQ, c0), bf.from_int(FQ, c1))

    @staticmethod
    def to_int(a):
        return (bf.to_int(FQ, a.c0), bf.to_int(FQ, a.c1))


class Point(NamedTuple):
    """Jacobian point; pytree of field elements (z == 0 -> infinity)."""

    x: object
    y: object
    z: object


def infinity(F, shape=()) -> Point:
    return Point(F.one(shape), F.one(shape), F.zeros(shape))


def from_affine(F, x, y) -> Point:
    return Point(x, y, F.one(jnp.shape(jax.tree_util.tree_leaves(x)[0])[:-1]))


def is_infinity(F, p: Point):
    return F.is_zero(p.z)


def double(F, p: Point) -> Point:
    a = F.sqr(p.x)
    b = F.sqr(p.y)
    c = F.sqr(b)
    t = F.sqr(F.add(p.x, b))
    d = F.add(F.sub(F.sub(t, a), c), F.sub(F.sub(t, a), c))
    e = F.add(F.add(a, a), a)
    f = F.sqr(e)
    x3 = F.sub(f, F.add(d, d))
    c8 = F.add(F.add(F.add(c, c), F.add(c, c)), F.add(F.add(c, c), F.add(c, c)))
    y3 = F.sub(F.mul(e, F.sub(d, x3)), c8)
    z3 = F.add(F.mul(p.y, p.z), F.mul(p.y, p.z))
    inf = is_infinity(F, p)
    return Point(
        F.select(inf, p.x, x3), F.select(inf, p.y, y3), F.select(inf, p.z, z3)
    )


def add(F, p: Point, q: Point) -> Point:
    """Complete addition via selects (handles inf, equal, negated)."""
    z1z1 = F.sqr(p.z)
    z2z2 = F.sqr(q.z)
    u1 = F.mul(p.x, z2z2)
    u2 = F.mul(q.x, z1z1)
    s1 = F.mul(F.mul(p.y, q.z), z2z2)
    s2 = F.mul(F.mul(q.y, p.z), z1z1)
    h = F.sub(u2, u1)
    r = F.sub(s2, s1)
    hh = F.sqr(h)
    hhh = F.mul(h, hh)
    v = F.mul(u1, hh)
    x3 = F.sub(F.sub(F.sqr(r), hhh), F.add(v, v))
    y3 = F.sub(F.mul(r, F.sub(v, x3)), F.mul(s1, hhh))
    z3 = F.mul(F.mul(p.z, q.z), h)
    res = Point(x3, y3, z3)

    same_x = F.is_zero(h)
    same_y = F.is_zero(r)
    dbl = double(F, p)
    # case order matters: equal points -> double; opposite -> infinity
    res = _sel_point(F, same_x & same_y, dbl, res)
    inf_shape = _shape_of(F, res)
    res = _sel_point(F, same_x & ~same_y, infinity(F, inf_shape), res)
    res = _sel_point(F, is_infinity(F, p), _bcast_point(F, q, inf_shape), res)
    res = _sel_point(F, is_infinity(F, q), _bcast_point(F, p, inf_shape), res)
    return res


def _shape_of(F, p: Point):
    return jnp.shape(jax.tree_util.tree_leaves(p.x)[0])[:-1]


def _bcast_point(F, p: Point, shape) -> Point:
    def b(leaf):
        return jnp.broadcast_to(leaf, tuple(shape) + (bf.N_LIMBS,))

    return jax.tree_util.tree_map(b, p)


def _sel_point(F, pred, a: Point, b: Point) -> Point:
    return Point(F.select(pred, a.x, b.x), F.select(pred, a.y, b.y),
                 F.select(pred, a.z, b.z))


def to_affine(F, p: Point):
    """Returns (x, y, is_inf)."""
    zinv = F.inv(F.select(F.is_zero(p.z), F.one(_shape_of(F, p)), p.z))
    zinv2 = F.sqr(zinv)
    x = F.mul(p.x, zinv2)
    y = F.mul(p.y, F.mul(zinv2, zinv))
    return x, y, is_infinity(F, p)


import functools


@functools.lru_cache(maxsize=None)
def _scalar_mul_jit(F):
    def fn(p: Point, bits: jnp.ndarray) -> Point:
        def body(carry, bit):
            acc, base = carry
            nxt = add(F, acc, base)
            sel = (bit != 0) & jnp.ones(_shape_of(F, base), bool)
            acc = _sel_point(F, sel, nxt, acc)
            base = double(F, base)
            return (acc, base), None

        (acc, _), _ = jax.lax.scan(
            body, (infinity(F, _shape_of(F, p)), p), bits
        )
        return acc

    return jax.jit(fn)


def scalar_mul(F, p: Point, e: int) -> Point:
    """p * e; fixed 256-bit scan so one compile serves every scalar."""
    e = e % (1 << 256)
    bits = jnp.array([(e >> i) & 1 for i in range(256)], dtype=jnp.uint32)
    return _scalar_mul_jit(F)(p, bits)


@functools.lru_cache(maxsize=None)
def _table_mul_jit(F):
    def fn(p: Point, bits: jnp.ndarray) -> Point:
        """bits: (n, 256) -> (n,) points [bits_i] * p (vectorized)."""
        n = bits.shape[0]
        base0 = _bcast_point(F, p, (n,))

        def body(carry, bit_col):
            acc, base = carry
            nxt = add(F, acc, base)
            acc = _sel_point(F, bit_col != 0, nxt, acc)
            base = double(F, base)
            return (acc, base), None

        (acc, _), _ = jax.lax.scan(
            body, (infinity(F, (n,)), base0), bits.T
        )
        return acc

    return jax.jit(fn)


def scalar_mul_table(F, p: Point, scalars) -> Point:
    """[e * p for e in scalars] as one (n,) Point, single compiled scan."""
    n = len(scalars)
    bits = np.zeros((n, 256), dtype=np.uint32)
    for i, e in enumerate(scalars):
        e = int(e)
        for k in range(256):
            bits[i, k] = (e >> k) & 1
    return _table_mul_jit(F)(p, jnp.asarray(bits))


# Generators
G1_GEN = (1, 2)
G2_GEN = (
    (
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    (
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)


def g1_generator() -> Point:
    return from_affine(F1, F1.from_int(G1_GEN[0]), F1.from_int(G1_GEN[1]))


def g2_generator() -> Point:
    return from_affine(
        F2,
        F2.from_int((G2_GEN[0][0], G2_GEN[0][1])),
        F2.from_int((G2_GEN[1][0], G2_GEN[1][1])),
    )

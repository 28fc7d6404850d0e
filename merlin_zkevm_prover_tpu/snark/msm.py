"""Pippenger multi-scalar multiplication, TPU-native formulation.

The reference's `ParallelMultiexp` (src/ffiasm/multiexp.c.hpp:36-100) does
per-thread bucket accumulation with scalar loops.  Scatter-style bucket
accumulation doesn't map to XLA, so this formulation is sort-based with
static shapes:

  per window: digit extraction -> sort points by digit (u32 key sort +
  gather) -> segmented prefix-sum of points (blocked scan with the
  (flag, point) segmented-add monoid) -> bucket totals read at segment
  ends -> weighted bucket reduction (lax.scan over buckets) -> window
  combine with c doublings per step.

Work: ~(bits/c) * N vectorized point-adds + 2^c scalar adds per window.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bn254_field as bf
from ..ops.scan_utils import prefix_prod
from . import curve
from .curve import Point


def _segmented_combine(F):
    def combine(a, b):
        fa, pa = a
        fb, pb = b
        flag = fa | fb
        summed = curve.add(F, pa, pb)
        pt = curve._sel_point(F, fb != 0, pb, summed)
        return (flag, pt)

    return combine


def _one_fn(F):
    def one(shape_prefix):
        sp = tuple(shape_prefix)
        return (jnp.zeros(sp, dtype=jnp.uint32), curve.infinity(F, sp))

    return one


def pick_window(n: int) -> int:
    """Pippenger window size for n points (clamped for the bucket scan)."""
    return max(2, min(12, n.bit_length() - 1))


def msm(F, points: Point, scalars: jnp.ndarray, bits: int = 254,
        c: int = None) -> Point:
    """Sum of scalars[i] * points[i].

    points: Point with (N, ...) field leaves; scalars: (N, 8) u64 limb
    array (plain integers, NOT Montgomery).  Returns a scalar Point.

    One lax.scan over windows (MSB first: acc <- 2^c * acc + W_w) so the
    per-window machinery — sort, segmented scan, bucket reduce — is traced
    exactly once.
    """
    n = scalars.shape[0]
    if c is None:
        c = pick_window(n)
    n_windows = -(-bits // c)
    n_buckets = 1 << c

    # digits[w, i] = bits [w*c, (w+1)*c) of scalars[i]
    digit_rows = []
    for w in range(n_windows):
        digit = jnp.zeros((n,), dtype=jnp.uint32)
        for k in range(c):
            bit_idx = w * c + k
            if bit_idx >= bits:
                break
            limb = scalars[:, bit_idx // 32]
            bit = ((limb >> np.uint64(bit_idx % 32)) & np.uint64(1)).astype(
                jnp.uint32
            )
            digit = digit | (bit << k)
        digit_rows.append(digit)
    digits = jnp.stack(digit_rows[::-1], axis=0)   # MSB window first

    combine = _segmented_combine(F)
    one_fn = _one_fn(F)

    def window_body(acc: Point, dig):
        order = jnp.argsort(dig)
        dsort = jnp.take(dig, order)
        pts = jax.tree_util.tree_map(
            lambda x: jnp.take(x, order, axis=0), points
        )
        flags = jnp.concatenate(
            [jnp.ones((1,), jnp.uint32),
             (dsort[1:] != dsort[:-1]).astype(jnp.uint32)]
        )
        _, pref = prefix_prod((flags, pts), combine, one_fn)
        counts = jnp.bincount(dsort, length=n_buckets)
        ends = jnp.cumsum(counts) - 1          # last index per bucket
        bucket = jax.tree_util.tree_map(
            lambda x: jnp.take(x, jnp.clip(ends, 0, n - 1), axis=0), pref
        )
        empty = counts == 0
        bucket = curve._sel_point(
            F, empty, curve.infinity(F, (n_buckets,)), bucket
        )
        # window sum = sum_b b * bucket[b] via descending running sum
        rev = jax.tree_util.tree_map(lambda x: x[1:][::-1], bucket)  # drop 0

        def body(carry, pt):
            running, accum = carry
            running = curve.add(F, running, pt)
            accum = curve.add(F, accum, running)
            return (running, accum), None

        (_, wsum), _ = jax.lax.scan(
            body, (curve.infinity(F, ()), curve.infinity(F, ())), rev
        )
        for _ in range(c):
            acc = curve.double(F, acc)
        return curve.add(F, acc, wsum), None

    acc, _ = jax.lax.scan(window_body, curve.infinity(F, ()), digits)
    return acc


@functools.lru_cache(maxsize=None)
def _msm_jit(F, bits: int, c: int):
    return jax.jit(lambda pts, s: msm(F, pts, s, bits, c))


def msm_jit(F, points: Point, scalars: jnp.ndarray, bits: int = 254,
            c: int = None) -> Point:
    """jit-cached MSM (one compile per (F, table shape))."""
    if c is None:
        c = pick_window(scalars.shape[0])
    return _msm_jit(F, bits, c)(points, scalars)

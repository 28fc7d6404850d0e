"""Blocked prefix products over field-element / group-element pytrees.

`jax.lax.associative_scan` unrolls its combine function ~2*log2(N) times
into the graph; with multi-limb field multiplies (~2k HLO ops each) that
makes XLA compile time the bottleneck.  This module computes prefix
combines with two `lax.scan`s instead — an intra-block pass (vector-wide
combine, compiled once, L iterations) and a block-offset pass (scalar
combine, K iterations) — giving O(1) combine instances in the graph and
O(sqrt(N)) sequential steps at runtime, which the TPU hides behind its
dispatch pipeline.

Works for any associative combine over pytrees whose leaves have the scan
axis leading (trailing dims ride along): Goldilocks/GF(p^3) products,
BN254 limb arrays, Jacobian curve points (the MSM segmented scan).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


def _tree_map(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def prefix_prod(a, mul: Callable, one_fn: Callable, reverse: bool = False,
                inclusive: bool = True):
    """Prefix combine along axis 0 of a pytree (leaves (N, ...)).

    mul(x, y): associative combine of two pytrees; one_fn(shape_prefix):
    identity pytree whose leaves have the given leading shape.  Returns the
    same pytree structure.
    """
    n = jax.tree_util.tree_leaves(a)[0].shape[0]
    if n == 0:
        return a
    if reverse:
        a = _tree_map(lambda x: jnp.flip(x, axis=0), a)

    l = 1 << ((n - 1).bit_length() + 1) // 2      # block length ~ sqrt(n)
    k = -(-n // l)
    pad = k * l - n
    if pad:
        padded = _tree_map(
            lambda x, o: jnp.concatenate([x, o], axis=0), a, one_fn((pad,))
        )
    else:
        padded = a
    # (L, K, ...) view: step i of the scan touches element [kk*l + i]
    mat = _tree_map(
        lambda x: x.reshape((k, l) + x.shape[1:]).swapaxes(0, 1), padded
    )

    def body(carry, x):
        nxt = mul(carry, x)
        return nxt, nxt

    totals, intra = jax.lax.scan(body, one_fn((k,)), mat)

    def obody(carry, x):
        return mul(carry, x), carry   # exclusive offsets

    _, offsets = jax.lax.scan(obody, one_fn(()), totals)
    # result[kk*l + i] = offsets[kk] * intra[i, kk]
    off_b = _tree_map(
        lambda x: jnp.broadcast_to(x[None], (l,) + x.shape), offsets
    )
    res = mul(off_b, intra)
    out = _tree_map(
        lambda x: x.swapaxes(0, 1).reshape((k * l,) + x.shape[2:])[:n], res
    )
    if not inclusive:
        one = one_fn(())

        def sh(x, o):
            return jnp.concatenate([o[None], x[:-1]], axis=0)

        out = _tree_map(sh, out, one)
    if reverse:
        out = _tree_map(lambda x: jnp.flip(x, axis=0), out)
    return out

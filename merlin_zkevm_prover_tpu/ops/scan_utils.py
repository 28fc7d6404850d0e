"""Blocked prefix products over field-element pytrees.

`jax.lax.associative_scan` unrolls its combine function ~2*log2(N) times
into the graph; with multi-limb field multiplies (~2k HLO ops each) that
makes XLA compile time the bottleneck.  This module computes prefix
products with two `lax.scan`s instead — an intra-block pass (vector-wide
combine, compiled once, L iterations) and a block-offset pass (scalar
combine, K iterations) — giving O(1) combine instances in the graph and
O(sqrt(N)) sequential steps at runtime, which the TPU hides behind its
dispatch pipeline.
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
    """Prefix products along axis 0 of a pytree of (N,)-arrays.

    mul(x, y): combine two pytrees elementwise; one_fn(shape): identity
    pytree of given shape.  Returns the same pytree structure.
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
            lambda x, o: jnp.concatenate([x, o]), a, one_fn((pad,))
        )
    else:
        padded = a
    # (L, K) view: step i of the scan touches element [kk*l + i] for all kk
    mat = _tree_map(lambda x: x.reshape(k, l).T, padded)

    def body(carry, x):
        nxt = mul(carry, x)
        return nxt, nxt

    totals, intra = jax.lax.scan(body, one_fn((k,)), mat)

    def obody(carry, x):
        return mul(carry, x), carry   # exclusive offsets

    _, offsets = jax.lax.scan(obody, one_fn(()), totals)
    # result[kk*l + i] = offsets[kk] * intra[i, kk]
    res = mul(_tree_map(lambda x: jnp.broadcast_to(x[None, :], (l, k)), offsets),
              intra)
    out = _tree_map(lambda x: x.T.reshape(k * l)[:n], res)
    if not inclusive:
        # shift right by one, fill identity
        one = one_fn(())

        def sh(x, o):
            return jnp.roll(x, 1, axis=0).at[0].set(o)

        out = _tree_map(sh, out, _tree_map(lambda v: v, one))
    if reverse:
        out = _tree_map(lambda x: jnp.flip(x, axis=0), out)
    return out

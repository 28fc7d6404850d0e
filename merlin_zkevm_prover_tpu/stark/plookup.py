"""Plookup h1/h2 and grand-product z — device-side, static shapes.

Reimplements the semantics of the reference `Polinomial::calculateH1H2_opt1/
_opt3` (src/starkpil/polinomial.hpp:349-585) and `Polinomial::calculateZ`
(polinomial.hpp:586-607) with TPU-friendly algorithms:

  * calculateH1H2 — the reference builds a hash table keyed on t-values,
    attributes each f occurrence to the *last* row of t holding that value,
    then emits the multiset f ∪ t ordered by t-row with h1/h2 as the
    even/odd interleave.  Here: lexicographic multi-key sort of t
    (jax.lax.sort), vectorized binary search of f into sorted t (upper
    bound = last occurrence), a segment-sum of multiplicities, and a
    searchsorted over the (int32) cumulative counts to materialize the
    merged sequence with fully static shapes.

  * calculateZ — z[i] = prod_{j<i} num[j]/den[j].  The reference runs a
    sequential loop + Montgomery batch inverse; here both cumulative
    products are log-depth `jax.lax.associative_scan`s and the denominator
    prefix inverses come from one Fermat inversion of the total product
    (inv(prefix_excl[i]) = suffix_incl[i] * inv(total)).
"""

from __future__ import annotations

from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import goldilocks3 as gl3
from ..ops.goldilocks import GL
from ..ops.goldilocks3 import GL3

Value = Union[GL, GL3]


def _key_limbs(v: Value) -> List[jnp.ndarray]:
    """Most-significant-first limb list for lexicographic compare.

    Under jax_enable_x64 each GL element packs into ONE u64 limb (XLA
    emulates u64 compares on the TPU's 32-bit lanes) — halving the sort's
    operand count, which is what its compile time scales with."""
    if gl._x64():
        if isinstance(v, GL3):
            return [gl._pack(v.c2), gl._pack(v.c1), gl._pack(v.c0)]
        return [gl._pack(v)]
    if isinstance(v, GL3):
        return [v.c2.hi, v.c2.lo, v.c1.hi, v.c1.lo, v.c0.hi, v.c0.lo]
    return [v.hi, v.lo]


def _lex_less(a: List[jnp.ndarray], b: List[jnp.ndarray]) -> jnp.ndarray:
    """a < b lexicographically, vectorized over matching shapes."""
    lt = jnp.zeros(a[0].shape, dtype=bool)
    eq = jnp.ones(a[0].shape, dtype=bool)
    for x, y in zip(a, b):
        lt = lt | (eq & (x < y))
        eq = eq & (x == y)
    return lt


def _lex_eq(a, b) -> jnp.ndarray:
    eq = jnp.ones(a[0].shape, dtype=bool)
    for x, y in zip(a, b):
        eq = eq & (x == y)
    return eq


def _gather(limbs: List[jnp.ndarray], idx: jnp.ndarray) -> List[jnp.ndarray]:
    return [jnp.take(l, idx, axis=0) for l in limbs]


def _upper_bound(sorted_limbs, query_limbs, n: int) -> jnp.ndarray:
    """Vectorized binary search: count of sorted entries <= query."""
    m = query_limbs[0].shape[0]
    lo = jnp.zeros(m, dtype=jnp.int32)
    hi = jnp.full(m, n, dtype=jnp.int32)
    steps = max(n.bit_length(), 1)
    for _ in range(steps):
        mid = (lo + hi) // 2
        mid_vals = _gather(sorted_limbs, mid)
        # sorted[mid] <= query  <=>  not (query < sorted[mid])
        le = ~_lex_less(query_limbs, mid_vals)
        lo = jnp.where(le, mid + 1, lo)
        hi = jnp.where(le, hi, mid)
    return lo  # index of first element > query == upper bound


def _select_rows(v: Value, idx: jnp.ndarray) -> Value:
    if isinstance(v, GL3):
        return GL3(
            _select_rows(v.c0, idx), _select_rows(v.c1, idx), _select_rows(v.c2, idx)
        )
    return GL(jnp.take(v.lo, idx, axis=0), jnp.take(v.hi, idx, axis=0))


def calculate_h1h2(f: Value, t: Value) -> Tuple[Value, Value, jnp.ndarray]:
    """Returns (h1, h2, ok) for one plookup set; f, t are (N,) GL or GL3.

    ok is a scalar bool: False iff some f value is absent from t (the
    reference exits the process in that case, polinomial.hpp:414).
    """
    n = f.shape[0] if isinstance(f, GL) else f.c0.shape[0]
    t_limbs = _key_limbs(t)
    idx = jnp.arange(n, dtype=jnp.int32)
    # sort t by (key asc, original index asc)
    sorted_ops = jax.lax.sort(tuple(t_limbs) + (idx,), num_keys=len(t_limbs) + 1)
    s_limbs = list(sorted_ops[:-1])
    s_idx = sorted_ops[-1]

    f_limbs = _key_limbs(f)
    ub = _upper_bound(s_limbs, f_limbs, n)          # first index > f value
    pos = jnp.clip(ub - 1, 0, n - 1)                # last occurrence if present
    found = _lex_eq(_gather(s_limbs, pos), f_limbs)
    ok = jnp.all(found)
    attr_t_row = jnp.take(s_idx, pos)               # original t row (last occ.)

    counts = jnp.ones(n, dtype=jnp.int32) + jax.ops.segment_sum(
        jnp.ones(n, dtype=jnp.int32), attr_t_row, num_segments=n
    )
    cum = jnp.cumsum(counts)                         # inclusive, total = 2N
    slots = jnp.arange(2 * n, dtype=jnp.int32)
    merged_id = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    merged = _select_rows(t, merged_id)
    h1 = _select_rows(merged, jnp.arange(0, 2 * n, 2))
    h2 = _select_rows(merged, jnp.arange(1, 2 * n, 2))
    return h1, h2, ok


def calculate_z(num: GL3, den: GL3) -> GL3:
    """z[i] = prod_{j<i} num[j]/den[j]; z[0] = 1.  (N,) GL3 in/out.

    The total product must be 1 for a satisfied argument (the reference
    zkasserts this, polinomial.hpp:604-606); here the wrap-around constraint
    z'*den - z*num == 0 at row N-1 enforces it in-proof.  Cumulative
    products use blocked scans (ops.scan_utils); the denominator prefix
    inverses come from one Fermat inversion of the total product.
    """
    pnum_excl = gl3.prefix_prod(num, inclusive=False)
    sden = gl3.prefix_prod(den, reverse=True)     # inclusive suffix of den
    tinv = gl3.inv(sden[0:1])                     # 1 / total(den), (1,)
    # inv(prefix_den_excl[i]) = suffix_den_incl[i] * inv(total)
    inv_pref_den_excl = gl3.mul(sden, tinv)       # broadcasts (1,) -> (N,)
    return gl3.mul(pnum_excl, inv_pref_den_excl)

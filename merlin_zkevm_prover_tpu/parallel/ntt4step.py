"""Sharded four-step NTT/LDE over a device mesh (explicit ICI collective).

The reference's column-batched NTT (`NTT_Goldilocks::extendPol`,
src/starkpil/starks.cpp:52 — SURVEY P2) is shared-memory OpenMP; one proof
never crosses a node.  Here one transform of 2^20..2^24 rows is sharded
across chips with the classic distributed four-step factorisation
N = N1 * N2:

  1. view x as (N1, N2, C), sharded over i2 — each chip owns complete
     columns, so the length-N1 sub-NTTs are chip-local;
  2. twiddle by w_N^(k1*i2) (local elementwise);
  3. ONE `jax.lax.all_to_all` over the mesh axis — the global transpose —
     after which each chip owns complete rows (sharded over k1);
  4. chip-local length-N2 sub-NTTs; output index k = k2*N1 + k1.

The chip-local sub-NTTs go through ops/ntt.py, which dispatches to the
Pallas VMEM-resident kernels on TPU and the jnp stages on CPU, so the
sharded result is bit-exact with the single-device transform on both
backends.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map  # type: ignore
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..ops import goldilocks as gl
from ..ops import ntt as nttmod
from ..ops.goldilocks import GL, P as GLP, SHIFT


def _split_bits(nbits: int, d: int) -> tuple:
    """Pick N1, N2 with N = N1*N2 and d | N1, d | N2 (d a power of two)."""
    dbits = int(d).bit_length() - 1
    assert (1 << dbits) == d, "mesh axis size must be a power of two"
    n1_bits = nbits // 2
    n2_bits = nbits - n1_bits
    assert n1_bits >= dbits and n2_bits >= dbits, (
        f"NTT 2^{nbits} too small to shard over {d} devices")
    return n1_bits, n2_bits


def ntt4step(x: GL, mesh: Mesh, axis: str = "rows",
             inverse: bool = False) -> GL:
    """(N, C) NTT/INTT over axis 0, sharded over `axis` of `mesh`.

    Natural order in and out; INTT includes the full 1/N scale (the two
    chip-local sub-INTTs contribute 1/N1 * 1/N2).
    """
    n, c = x.shape
    nbits = int(n).bit_length() - 1
    assert (1 << nbits) == n
    d = mesh.shape[axis]
    n1_bits, n2_bits = _split_bits(nbits, d)
    n1, n2 = 1 << n1_bits, 1 << n2_bits

    tw = _fourstep_twiddle_host(n1_bits, n2_bits, inverse)  # GL (N1, N2, 1)

    sub = nttmod.intt if inverse else nttmod.ntt

    def local_fn(xl: GL, tl: GL) -> GL:
        # xl: (N1, N2/d, C); tl: (N1, N2/d, 1)
        n2d = xl.shape[1]
        y = sub(xl.reshape(n1, n2d * c))
        y = y.reshape(n1, n2d, c)
        y = gl.mul(y, GL(jnp.broadcast_to(tl.lo, y.shape),
                         jnp.broadcast_to(tl.hi, y.shape)))
        # global transpose: shard over k1 instead of i2
        zlo = jax.lax.all_to_all(y.lo, axis, split_axis=0, concat_axis=1, tiled=True)
        zhi = jax.lax.all_to_all(y.hi, axis, split_axis=0, concat_axis=1, tiled=True)
        # zlo: (N1/d, N2, C) — NTT over i2 per local row
        n1d = zlo.shape[0]
        z = GL(jnp.transpose(zlo, (1, 0, 2)).reshape(n2, n1d * c),
               jnp.transpose(zhi, (1, 0, 2)).reshape(n2, n1d * c))
        z = sub(z)
        return z.reshape(n2, n1d, c)

    spec_in = P(None, axis, None)
    spec_out = P(None, axis, None)
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(spec_in, spec_in), out_specs=spec_out)
    x3 = x.reshape(n1, n2, c)
    out = fn(x3, tw)  # (N2, N1, C), k = k2*N1 + k1
    return out.reshape(n, c)


def _fourstep_twiddle_host(n1_bits: int, n2_bits: int, inverse: bool) -> GL:
    # trace-safe cached table (ops/ntt_tpu caches device arrays only
    # outside a trace; inside jit it embeds a fresh constant)
    from ..ops.ntt_tpu import _fourstep_twiddle

    return _fourstep_twiddle(n1_bits, n2_bits, inverse)


def extend_pol_4step(x: GL, n_bits: int, n_bits_ext: int, mesh: Mesh,
                     axis: str = "rows", shift: int = SHIFT) -> GL:
    """Sharded coset LDE: INTT -> (1/N folded) coset scale -> pad -> NTT.

    Same semantics as ops/ntt.extend_pol / reference
    NTT_Goldilocks::extendPol (starks.cpp:52), sharded over `axis`.
    """
    n, c = x.shape
    assert n == 1 << n_bits
    n_ext = 1 << n_bits_ext
    coeffs = ntt4step(x, mesh, axis, inverse=True)
    pows = gl.powers_np(shift, n)
    sv = GL(
        jnp.asarray((pows & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None]),
        jnp.asarray((pows >> np.uint64(32)).astype(np.uint32)[:, None]),
    )
    coeffs = gl.mul(coeffs, GL(jnp.broadcast_to(sv.lo, (n, c)),
                               jnp.broadcast_to(sv.hi, (n, c))))
    padded = GL(
        jnp.concatenate([coeffs.lo, jnp.zeros((n_ext - n, c), jnp.uint32)]),
        jnp.concatenate([coeffs.hi, jnp.zeros((n_ext - n, c), jnp.uint32)]),
    )
    return ntt4step(padded, mesh, axis, inverse=False)

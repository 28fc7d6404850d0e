"""Radix-2 FFT over the BN254 scalar field Fr (reference src/ffiasm/fft.c.hpp).

Same in-order DIT stage structure as the Goldilocks NTT (ops/ntt.py), with
Montgomery-form (..., 8)-limb elements and host-precomputed twiddles.
Used by the Groth16 prover's 3x (iFFT -> coset shift -> FFT) pipeline
(reference src/rapidsnark/groth16.c.hpp:49-204).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bn254_field as bf
from ..ops.bn254_field import FR

# Fr multiplicative generator and 2-adicity (r - 1 = 2^28 * odd)
FR_GENERATOR = 5
FR_TWO_ADICITY = 28


@functools.lru_cache(maxsize=None)
def w_fr(nbits: int) -> int:
    assert nbits <= FR_TWO_ADICITY
    return pow(FR_GENERATOR, (FR.mod - 1) >> nbits, FR.mod)


@functools.lru_cache(maxsize=None)
def _bitrev(nbits: int) -> np.ndarray:
    n = 1 << nbits
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(nbits):
        rev |= ((idx >> b) & 1).astype(np.uint32) << (nbits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _twiddles_mont(nbits: int, inverse: bool) -> np.ndarray:
    root = w_fr(nbits)
    if inverse:
        root = pow(root, FR.mod - 2, FR.mod)
    half = max(1 << (nbits - 1), 1)
    vals = np.empty(half, dtype=object)
    cur = 1
    for i in range(half):
        vals[i] = cur
        cur = cur * root % FR.mod
    return np.asarray(jax.device_get(bf.from_int(FR, vals)))


def _fft_core(a: jnp.ndarray, nbits: int, inverse: bool) -> jnp.ndarray:
    """(N, ..., 8) Montgomery Fr array; FFT along axis 0, natural order."""
    n = 1 << nbits
    if nbits == 0:
        return a
    perm = jnp.asarray(_bitrev(nbits))
    x = jnp.take(a, perm, axis=0)
    table = _twiddles_mont(nbits, inverse)
    for s in range(1, nbits + 1):
        m = 1 << (s - 1)
        stride = 1 << (nbits - s)
        tw = jnp.asarray(table[::stride][:m])          # (m, 8)
        xr = x.reshape((n // (2 * m), 2, m) + x.shape[1:])
        u = xr[:, 0]
        extra = u.ndim - tw.ndim - 1
        twb = tw.reshape((1, m) + (1,) * extra + (bf.N_LIMBS,))
        v = bf.mont_mul(FR, xr[:, 1], jnp.broadcast_to(twb, u.shape))
        hi = bf.add(FR, u, v)
        lo = bf.sub(FR, u, v)
        x = jnp.stack([hi, lo], axis=1).reshape((n,) + x.shape[1:])
    if inverse:
        ninv = bf.from_int(FR, pow(n, FR.mod - 2, FR.mod))
        x = bf.mont_mul(FR, x, jnp.broadcast_to(ninv, x.shape))
    return x


def fft(a: jnp.ndarray) -> jnp.ndarray:
    nbits = int(a.shape[0]).bit_length() - 1
    assert 1 << nbits == a.shape[0]
    return _fft_core(a, nbits, inverse=False)


def ifft(a: jnp.ndarray) -> jnp.ndarray:
    nbits = int(a.shape[0]).bit_length() - 1
    assert 1 << nbits == a.shape[0]
    return _fft_core(a, nbits, inverse=True)


def coset_scale(coeffs: jnp.ndarray, shift: int) -> jnp.ndarray:
    """coeff[i] *= shift^i (host-precomputed Montgomery powers)."""
    n = coeffs.shape[0]
    vals = np.empty(n, dtype=object)
    cur = 1
    for i in range(n):
        vals[i] = cur
        cur = cur * shift % FR.mod
    pows = bf.from_int(FR, vals)
    extra = coeffs.ndim - 2
    pows = pows.reshape((n,) + (1,) * extra + (bf.N_LIMBS,))
    return bf.mont_mul(FR, coeffs, jnp.broadcast_to(pows, coeffs.shape))

"""Number-theoretic transform over Goldilocks, TPU-native.

Reimplements the capability of the reference prover's `NTT_Goldilocks`
(reference call sites: src/starkpil/starks.hpp:46-47, starks.cpp:52,133,214,
261,284,325-326 and src/starkpil/fri/friProve.cpp:100-102):

  * ``ntt(a)``        — forward NTT, natural order in / natural order out
  * ``intt(a)``       — inverse NTT (includes the 1/N scale)
  * ``extend_pol(a)`` — low-degree extension: INTT -> coset-scale by
                        ``shift^i`` -> zero-pad -> NTT on the 2^n_bits_ext
                        domain.  Mirrors ``NTT_Goldilocks::extendPol``.

Design: a radix-2 decimation-in-time transform expressed as ``log2(N)``
fully-vectorised stages over the row axis, with the column axis untouched —
columns are the embarrassingly-parallel axis, exactly the batching the
reference gets from its `ncols` argument.  Each stage is a reshape +
elementwise GL butterfly, which XLA fuses into a handful of VPU loops; the
bit-reversal is a single static gather.  All arithmetic is the 2x-uint32-limb
Goldilocks from :mod:`.goldilocks` so results are bit-exact with the
reference's uint64 arithmetic.

For multi-chip scaling, :func:`ntt` composes with ``shard_map`` via the
four-step factorisation in :mod:`merlin_zkevm_prover_tpu.parallel.ntt4step`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from .goldilocks import GL, P, SHIFT


# ---------------------------------------------------------------------------
# Host-side tables (cached per size)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _bitrev_perm(nbits: int) -> np.ndarray:
    n = 1 << nbits
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(nbits):
        rev |= ((idx >> b) & 1).astype(np.uint32) << (nbits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _twiddle_table(nbits: int, inverse: bool) -> np.ndarray:
    """Powers w^0 .. w^(N/2-1) of the 2^nbits-th root (or its inverse)."""
    root = gl.w(nbits) if not inverse else gl.w_inv(nbits)
    return gl.powers_np(root, max(1 << (nbits - 1), 1))


@functools.lru_cache(maxsize=None)
def _n_inv(nbits: int) -> int:
    return pow(1 << nbits, P - 2, P)


@functools.lru_cache(maxsize=None)
def _shift_powers(nbits: int, inverse: bool = False) -> np.ndarray:
    base = SHIFT if not inverse else gl.SHIFT_INV
    return gl.powers_np(base, 1 << nbits)


# ---------------------------------------------------------------------------
# Core transform
# ---------------------------------------------------------------------------


def _as_2d(a: GL):
    """View (N,) or (N, C...) as (N, C); returns (gl2d, restore_fn)."""
    shape = a.shape
    n = shape[0]
    if a.lo.ndim == 1:
        return a.reshape(n, 1), lambda x: x.reshape(n)
    if a.lo.ndim == 2:
        return a, lambda x: x
    c = int(np.prod(shape[1:]))
    return a.reshape(n, c), lambda x: x.reshape(*shape)


@functools.lru_cache(maxsize=None)
def _pease_twiddles(nbits: int, inverse: bool) -> np.ndarray:
    """(nbits, N/2) stage twiddles of the constant-geometry DIF NTT:
    stage s uses w_{2^(nbits-s+1)}^(i >> (s-1))."""
    n2 = 1 << (nbits - 1)
    rows = []
    for s in range(1, nbits + 1):
        root = gl.w_inv(nbits - s + 1) if inverse else gl.w(nbits - s + 1)
        base = gl.powers_np(root, n2 >> (s - 1))
        rows.append(np.repeat(base, 1 << (s - 1)))
    return np.stack(rows, axis=0)


# The scan form's twiddle table is (nbits, N/2) u64 — cap it so huge
# transforms (TPU sizes route to Pallas anyway) fall back to the unrolled
# stage loop instead of materializing a multi-GB table.
_SCAN_MAX_BITS = 20


def _ntt_2d_scan(a: GL, nbits: int, inverse: bool) -> GL:
    """Constant-geometry (Pease) radix-2 DIF NTT: natural order in, one
    bit-reversal gather out.  Every stage shares ONE scanned butterfly body
    (u+v, (u-v)*tw, perfect shuffle), so the compiled graph is a single
    loop instead of nbits unrolled stages — the dominant compile-time cost
    of the CPU/oracle path."""
    n = 1 << nbits
    c = a.shape[1]
    tws = gl.from_u64(_pease_twiddles(nbits, inverse))  # (nbits, n/2)

    def body(x: GL, tw: GL):
        u, v = x[: n // 2], x[n // 2:]
        s_ = gl.add(u, v)
        d = gl.mul(gl.sub(u, v),
                   GL(jnp.broadcast_to(tw.lo[:, None], (n // 2, c)),
                      jnp.broadcast_to(tw.hi[:, None], (n // 2, c))))
        return GL(
            jnp.stack([s_.lo, d.lo], axis=1).reshape(n, c),
            jnp.stack([s_.hi, d.hi], axis=1).reshape(n, c),
        ), None

    x, _ = jax.lax.scan(body, a, tws)
    perm = jnp.asarray(_bitrev_perm(nbits))
    x = GL(jnp.take(x.lo, perm, axis=0), jnp.take(x.hi, perm, axis=0))
    if inverse:
        x = gl.mul(x, gl.const(_n_inv(nbits)))
    return x


def _ntt_2d(a: GL, nbits: int, inverse: bool) -> GL:
    """In-order radix-2 NTT over axis 0 of an (N, C) GL array."""
    n = 1 << nbits
    c = a.shape[1]
    if nbits == 0:
        return a
    if 2 <= nbits <= _SCAN_MAX_BITS:
        return _ntt_2d_scan(a, nbits, inverse)

    perm = jnp.asarray(_bitrev_perm(nbits))
    x = GL(jnp.take(a.lo, perm, axis=0), jnp.take(a.hi, perm, axis=0))

    table = _twiddle_table(nbits, inverse)  # np.uint64, length N/2
    for s in range(1, nbits + 1):
        m = 1 << (s - 1)  # half butterfly size
        stride = 1 << (nbits - s)
        tw_np = table[:: stride][:m] if m > 1 else table[:1]
        tw = gl.from_u64(tw_np).reshape(1, m, 1)
        xr = x.reshape(n // (2 * m), 2, m, c)
        u = xr[:, 0]
        v = gl.mul(xr[:, 1], GL(jnp.broadcast_to(tw.lo, u.shape),
                                jnp.broadcast_to(tw.hi, u.shape)))
        hi_ = gl.add(u, v)
        lo_ = gl.sub(u, v)
        x = GL(
            jnp.stack([hi_.lo, lo_.lo], axis=1).reshape(n, c),
            jnp.stack([hi_.hi, lo_.hi], axis=1).reshape(n, c),
        )

    if inverse:
        x = gl.mul(x, gl.const(_n_inv(nbits)))
    return x


# TPU fast path: route large transforms to the Pallas VMEM-resident kernels
# (ops/ntt_tpu.py); the jnp stages below remain the CPU/reference path and
# the bit-exactness oracle.
_TPU_MIN_ELEMS = 1 << 14


@functools.lru_cache(maxsize=1)
def _tpu_kernels():
    try:
        from . import ntt_tpu

        if ntt_tpu.available():
            return ntt_tpu
    except Exception:  # pragma: no cover
        pass
    return None


def _use_tpu(a2: GL) -> bool:
    if a2.shape[0] * a2.shape[1] < _TPU_MIN_ELEMS or a2.shape[0] < 4:
        return False
    return _tpu_kernels() is not None


def ntt(a: GL) -> GL:
    """Forward NTT over axis 0 (natural order in and out)."""
    a2, restore = _as_2d(a)
    nbits = int(a2.shape[0]).bit_length() - 1
    assert (1 << nbits) == a2.shape[0], "NTT size must be a power of two"
    if _use_tpu(a2):
        return restore(_tpu_kernels().ntt_tpu(a2))
    return restore(_ntt_2d(a2, nbits, inverse=False))


def intt(a: GL) -> GL:
    """Inverse NTT over axis 0, including the 1/N normalisation."""
    a2, restore = _as_2d(a)
    nbits = int(a2.shape[0]).bit_length() - 1
    assert (1 << nbits) == a2.shape[0]
    if _use_tpu(a2):
        return restore(_tpu_kernels().ntt_tpu(a2, inverse=True))
    return restore(_ntt_2d(a2, nbits, inverse=True))


def coset_scale(coeffs: GL, shift: int = SHIFT) -> GL:
    """Multiply coefficient i by shift^i (evaluation-domain coset shift)."""
    a2, restore = _as_2d(coeffs)
    nbits = int(a2.shape[0]).bit_length() - 1
    if shift == SHIFT:
        pows_np = _shift_powers(nbits)
    elif shift == gl.SHIFT_INV:
        pows_np = _shift_powers(nbits, inverse=True)
    else:
        pows_np = gl.powers_np(shift, a2.shape[0])
    pows = gl.from_u64(pows_np).reshape(a2.shape[0], 1)
    return restore(gl.mul(a2, GL(jnp.broadcast_to(pows.lo, a2.shape),
                                 jnp.broadcast_to(pows.hi, a2.shape))))


# Memory plan for wide matrices (the zkEVM's 665-column cm1, 220-column
# const): one whole-matrix LDE at 2^18+ materializes several full-size
# u32-limb intermediates (bit-reversal gathers, four-step twiddle products,
# transposes) and exhausts HBM.  extend_pol_blocked runs the LDE in fixed
# 64-column blocks, each under its own jit so XLA bounds the block's
# intermediate lifetimes; the final block is zero-padded to the block width
# so every block shares ONE compiled executable.  (Reference analogue: the
# section-sized buffer plan of prover.cpp:99-120.)
EXTEND_BLOCK_COLS = 64


@functools.lru_cache(maxsize=None)
def _extend_block_jit(n_bits: int, n_bits_ext: int, shift: int):
    def f(a2: GL) -> GL:
        return extend_pol(a2, n_bits, n_bits_ext, shift)

    return jax.jit(f)


def extend_pol_blocked(a: GL, n_bits: int, n_bits_ext: int,
                       shift: int = SHIFT,
                       block_cols: int = EXTEND_BLOCK_COLS) -> GL:
    """Column-blocked coset LDE: same result as extend_pol, bounded peak
    HBM (one 64-column transform's intermediates at a time)."""
    a2, _ = _as_2d(a)
    n, c = a2.shape
    assert a.lo.ndim == 2, "blocked extend expects an (N, C) matrix"
    if c == 0:
        return gl.zeros((1 << n_bits_ext, 0))
    if c <= block_cols:
        return _extend_block_jit(n_bits, n_bits_ext, shift)(a2)
    fn = _extend_block_jit(n_bits, n_bits_ext, shift)
    parts = []
    for i in range(0, c, block_cols):
        blk = GL(a2.lo[:, i:i + block_cols], a2.hi[:, i:i + block_cols])
        w = blk.shape[1]
        if w < block_cols:
            blk = GL(jnp.pad(blk.lo, ((0, 0), (0, block_cols - w))),
                     jnp.pad(blk.hi, ((0, 0), (0, block_cols - w))))
        out = fn(blk)
        if w < block_cols:
            out = GL(out.lo[:, :w], out.hi[:, :w])
        parts.append(out)
    return gl.concat(parts, axis=1)


def extend_pol(a: GL, n_bits: int, n_bits_ext: int, shift: int = SHIFT) -> GL:
    """Low-degree extension onto the shifted 2^n_bits_ext domain.

    Equivalent to reference ``NTT_Goldilocks::extendPol(dst, src, NExt, N,
    ncols)`` (used at src/starkpil/starks.cpp:52): interpolate the N
    evaluations, coset-shift the coefficients, zero-pad to NExt, and
    re-evaluate.
    """
    a2, restore_in = _as_2d(a)
    n, c = a2.shape
    assert n == 1 << n_bits
    next_ = 1 << n_bits_ext
    if _use_tpu(a2):
        out = _tpu_kernels().extend_pol_tpu(a2, n_bits, n_bits_ext, shift)
        if a.lo.ndim == 1:
            return out.reshape(next_)
        if a.lo.ndim == 2:
            return out
        return out.reshape(next_, *a.shape[1:])
    coeffs = _ntt_2d(a2, n_bits, inverse=True)
    coeffs = coset_scale(coeffs, shift)
    padded = GL(
        jnp.concatenate([coeffs.lo, jnp.zeros((next_ - n, c), jnp.uint32)]),
        jnp.concatenate([coeffs.hi, jnp.zeros((next_ - n, c), jnp.uint32)]),
    )
    out = _ntt_2d(padded, n_bits_ext, inverse=False)
    if a.lo.ndim == 1:
        return out.reshape(next_)
    if a.lo.ndim == 2:
        return out
    return out.reshape(next_, *a.shape[1:])


def eval_pol_coeffs(coeffs: GL, x) -> GL:
    """Horner evaluation of a coefficient-form polynomial at scalar x (GL)."""
    a2, _ = _as_2d(coeffs)
    n, c = a2.shape

    def body(carry, row):
        return gl.add(gl.mul(carry, x), row), None

    rev = GL(a2.lo[::-1], a2.hi[::-1])
    out, _ = jax.lax.scan(body, gl.zeros((c,)), rev)
    return out

"""Pallas TPU kernels for the Goldilocks NTT (four-step, VMEM-resident).

This is the production device path for the reference's hot loop #2 —
`NTT_Goldilocks::NTT/INTT/extendPol` (reference src/starkpil/starks.cpp:52,
133,214,261,284; friProve.cpp:100-102) — designed for the TPU memory
hierarchy instead of translated:

  * the jnp formulation (ops/ntt.py) runs log2(N) butterfly stages, each a
    full HBM round-trip; this module runs all stages of a length-L <= 4096
    transform inside one Pallas kernel with the block resident in VMEM —
    one HBM read and one write for the whole transform;
  * sizes above 4096 use the four-step factorisation N = N1*N2:
    column NTTs (leading axis, in VMEM) -> twiddle w_N^(k1*i2) (one XLA
    elementwise pass) -> transpose -> row NTTs -> natural-order output.
    This is the same factorisation `parallel/ntt4step.py` shards over chips;
    here both sub-transforms run on one chip;
  * bit-reversal is a single XLA row gather before each kernel;
  * butterflies use the same 2x-uint32-limb Goldilocks arithmetic as
    ops/goldilocks.py, so results are bit-exact with the jnp path.

Twiddle layout: per-stage tables concatenated into one (L-1, 1) array —
stage s (1-indexed, half-size m = 2^(s-1)) occupies [m-1 : 2m-1) and holds
w_L^(t * L / 2^s) for t < m; stage 1 has unit twiddle and skips the multiply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from .goldilocks import GL, P, SHIFT
from .poseidon_tpu import _gl_mul  # same uint32-limb field mul

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

MAX_KERNEL_BITS = 9  # largest in-VMEM transform (Mosaic stack alloc bound)
_BC = 256  # trailing (lane) block width (sweep: 6% over 128 on v5e)


def _gl_add(a, b):
    lo = a[0] + b[0]
    c = (lo < a[0]).astype(jnp.uint32)
    hi1 = a[1] + b[1]
    hi = hi1 + c
    carry = ((hi1 < a[1]) | (hi < hi1)).astype(jnp.uint32)
    eps = np.uint32(gl.EPSILON & 0xFFFFFFFF)
    lo2 = lo + carry * eps
    hi2 = hi + (lo2 < lo).astype(jnp.uint32)
    ge = (hi2 == np.uint32(0xFFFFFFFF)) & (lo2 != 0)
    return (
        jnp.where(ge, lo2 - np.uint32(1), lo2),
        jnp.where(ge, jnp.zeros_like(hi2), hi2),
    )


def _gl_sub(a, b):
    lo = a[0] - b[0]
    b0 = (a[0] < b[0]).astype(jnp.uint32)
    hi1 = a[1] - b[1]
    brw = ((a[1] < b[1]) | (hi1 < b0)).astype(jnp.uint32)
    hi = hi1 - b0
    eps = np.uint32(gl.EPSILON & 0xFFFFFFFF)
    lo2 = lo - brw * eps
    hi2 = hi - (lo < lo2).astype(jnp.uint32)
    return lo2, hi2


# ---------------------------------------------------------------------------
# Host tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _stage_tables_np(nbits: int, inverse: bool):
    """Concatenated per-stage twiddles, (2^nbits - 1,) uint64."""
    n = 1 << nbits
    root = gl.w(nbits) if not inverse else gl.w_inv(nbits)
    full = gl.powers_np(root, n // 2 if n > 1 else 1)
    out = np.empty(max(n - 1, 1), dtype=np.uint64)
    out[0] = 1
    for s in range(1, nbits + 1):
        m = 1 << (s - 1)
        stride = n >> s
        out[m - 1: 2 * m - 1] = full[::stride][:m]
    return out


def _trace_clean() -> bool:
    try:
        from jax._src import core as _jcore

        return _jcore.trace_state_clean()
    except Exception:  # pragma: no cover
        return False


def _u64_cols_to_pair(t: np.ndarray):
    return (
        jnp.asarray((t & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None]),
        jnp.asarray((t >> np.uint64(32)).astype(np.uint32)[:, None]),
    )


@functools.lru_cache(maxsize=None)
def _stage_tables_dev(nbits: int, inverse: bool):
    return _u64_cols_to_pair(_stage_tables_np(nbits, inverse))


def _stage_tables(nbits: int, inverse: bool):
    # device arrays may only be cached outside a trace — a jnp constant
    # created while tracing is a Tracer and caching it leaks it
    if _trace_clean():
        return _stage_tables_dev(nbits, inverse)
    return _u64_cols_to_pair(_stage_tables_np(nbits, inverse))


@functools.lru_cache(maxsize=None)
def _bitrev(nbits: int) -> np.ndarray:
    n = 1 << nbits
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(nbits):
        rev |= ((idx >> b) & 1).astype(np.uint32) << (nbits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _fourstep_twiddle_np(n1_bits: int, n2_bits: int, inverse: bool):
    n1, n2 = 1 << n1_bits, 1 << n2_bits
    nbits = n1_bits + n2_bits
    w_n = gl.w(nbits) if not inverse else gl.w_inv(nbits)
    col = gl.powers_np(w_n, n1)  # w^k1
    t = np.empty((n1, n2), dtype=np.uint64)
    for k1 in range(n1):
        t[k1] = gl.powers_np(int(col[k1]), n2)
    return t


def _twiddle_np_to_gl(t: np.ndarray) -> GL:
    return GL(
        jnp.asarray((t & np.uint64(0xFFFFFFFF)).astype(np.uint32)[..., None]),
        jnp.asarray((t >> np.uint64(32)).astype(np.uint32)[..., None]),
    )


@functools.lru_cache(maxsize=None)
def _fourstep_twiddle_dev(n1_bits: int, n2_bits: int, inverse: bool):
    return _twiddle_np_to_gl(_fourstep_twiddle_np(n1_bits, n2_bits, inverse))


def _fourstep_twiddle(n1_bits: int, n2_bits: int, inverse: bool):
    """T[k1, i2] = w_N^(+-k1*i2) as GL of shape (N1, N2, 1)."""
    if _trace_clean():
        return _fourstep_twiddle_dev(n1_bits, n2_bits, inverse)
    return _twiddle_np_to_gl(_fourstep_twiddle_np(n1_bits, n2_bits, inverse))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _ntt_kernel(nbits: int):
    l = 1 << nbits

    def kernel(tw_lo_ref, tw_hi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        bc = lo_ref.shape[1]

        def body(s0_lo, s0_hi, s1_lo, s1_hi):
            # ping-pong between two scratch pairs so only one stage's
            # buffers are ever live (the naive unrolled form OOMs VMEM)
            bufs = [(s0_lo, s0_hi), (s1_lo, s1_hi)]

            def stage(s, src, dst):
                m = 1 << (s - 1)
                g = l // (2 * m)
                rlo = src[0][:].reshape(g, 2, m, bc)
                rhi = src[1][:].reshape(g, 2, m, bc)
                ulo, uhi = rlo[:, 0], rhi[:, 0]
                vlo, vhi = rlo[:, 1], rhi[:, 1]
                if s > 1:
                    tlo = tw_lo_ref[m - 1: 2 * m - 1]
                    thi = tw_hi_ref[m - 1: 2 * m - 1]
                    tlo = jnp.broadcast_to(tlo.reshape(1, m, 1), (g, m, bc))
                    thi = jnp.broadcast_to(thi.reshape(1, m, 1), (g, m, bc))
                    vlo, vhi = _gl_mul((vlo, vhi), (tlo, thi))
                alo, ahi = _gl_add((ulo, uhi), (vlo, vhi))
                blo, bhi = _gl_sub((ulo, uhi), (vlo, vhi))
                dst[0][:] = jnp.stack([alo, blo], axis=1).reshape(l, bc)
                dst[1][:] = jnp.stack([ahi, bhi], axis=1).reshape(l, bc)

            stage(1, (lo_ref, hi_ref), bufs[0])
            for s in range(2, nbits):
                stage(s, bufs[(s - 2) % 2], bufs[(s - 1) % 2])
            if nbits >= 2:
                stage(nbits, bufs[(nbits - 2) % 2],
                      (out_lo_ref, out_hi_ref))
            else:
                out_lo_ref[:] = bufs[0][0][:]
                out_hi_ref[:] = bufs[0][1][:]

        pl.run_scoped(
            body,
            s0_lo=pltpu.VMEM((l, bc), jnp.uint32),
            s0_hi=pltpu.VMEM((l, bc), jnp.uint32),
            s1_lo=pltpu.VMEM((l, bc), jnp.uint32),
            s1_hi=pltpu.VMEM((l, bc), jnp.uint32),
        )

    return kernel


@functools.lru_cache(maxsize=None)
def _ntt_call(nbits: int, n_blocks: int, interpret: bool):
    l = 1 << nbits
    tw_len = max(l - 1, 1)

    def fn(tw_lo, tw_hi, lo, hi):
        return pl.pallas_call(
            _ntt_kernel(nbits),
            grid=(n_blocks,),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((tw_len, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tw_len, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l, _BC), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l, _BC), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((l, _BC), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l, _BC), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(lo.shape, jnp.uint32),
                jax.ShapeDtypeStruct(hi.shape, jnp.uint32),
            ],
        )(tw_lo, tw_hi, lo, hi)

    def traced(tw_lo, tw_hi, lo, hi):
        with jax.enable_x64(False):
            return fn(tw_lo, tw_hi, lo, hi)

    return jax.jit(traced)


def _ntt_leading(x: GL, nbits: int, inverse: bool,
                 interpret: bool = False) -> GL:
    """Unscaled NTT over axis 0 of (L, B); L = 2^nbits <= 4096."""
    l, b = x.shape
    assert l == 1 << nbits and nbits <= MAX_KERNEL_BITS
    perm = jnp.asarray(_bitrev(nbits))
    lo = jnp.take(x.lo, perm, axis=0)
    hi = jnp.take(x.hi, perm, axis=0)
    pad = (-b) % _BC
    if pad:
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
    tw_lo, tw_hi = _stage_tables(nbits, inverse)
    out_lo, out_hi = _ntt_call(nbits, (b + pad) // _BC, interpret)(
        tw_lo, tw_hi, lo, hi)
    return GL(out_lo[:, :b], out_hi[:, :b])


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _split(nbits: int):
    n2_bits = min(MAX_KERNEL_BITS, nbits - 1)
    n1_bits = nbits - n2_bits
    return n1_bits, n2_bits


def _ntt_rec(a2: GL, nbits: int, inverse: bool, interpret: bool) -> GL:
    """Unscaled NTT over axis 0 of a 2-D (N, B) GL array; recursive
    four-step above the in-VMEM kernel size."""
    if nbits <= MAX_KERNEL_BITS:
        return _ntt_leading(a2, nbits, inverse, interpret)
    n, c = a2.shape
    n1_bits, n2_bits = _split(nbits)
    n1, n2 = 1 << n1_bits, 1 << n2_bits
    # step A: column NTTs over i1
    y = _ntt_rec(a2.reshape(n1, n2 * c), n1_bits, inverse, interpret)
    # step B: twiddle w_N^(k1*i2)
    t = _fourstep_twiddle(n1_bits, n2_bits, inverse)
    y = gl.mul(y.reshape(n1, n2, c),
               GL(jnp.broadcast_to(t.lo, (n1, n2, c)),
                  jnp.broadcast_to(t.hi, (n1, n2, c))))
    # step C: row NTTs over i2 (transpose so i2 leads)
    z = GL(jnp.transpose(y.lo, (1, 0, 2)).reshape(n2, n1 * c),
           jnp.transpose(y.hi, (1, 0, 2)).reshape(n2, n1 * c))
    z = _ntt_rec(z, n2_bits, inverse, interpret)
    # output index k = k2*n1 + k1
    return z.reshape(n, c)


def ntt_tpu(a: GL, inverse: bool = False, scale: int | None = None,
            interpret: bool = False) -> GL:
    """NTT/INTT over axis 0 of an (N, C) GL array, natural order in/out.

    `scale`: optional extra per-element constant folded into the output
    (used for the INTT 1/N factor); defaults to 1/N when inverse.
    """
    shape = a.shape
    n = shape[0]
    nbits = int(n).bit_length() - 1
    assert (1 << nbits) == n
    a2 = a.reshape(n, -1) if a.lo.ndim != 2 else a
    if scale is None and inverse:
        scale = pow(n, P - 2, P)
    out = _ntt_rec(a2, nbits, inverse, interpret)
    if scale is not None and scale != 1:
        out = gl.mul(out, gl.const(scale))
    return out.reshape(*shape)


def intt_tpu(a: GL, interpret: bool = False) -> GL:
    return ntt_tpu(a, inverse=True, interpret=interpret)


@functools.lru_cache(maxsize=None)
def _scale_shift_np(nbits: int, shift: int, with_ninv: bool):
    n = 1 << nbits
    v = gl.powers_np(shift, n)
    if with_ninv:
        ninv = pow(n, P - 2, P)
        v = (v.astype(object) * ninv % P).astype(np.uint64)
    return v


@functools.lru_cache(maxsize=None)
def _scale_shift_vec_dev(nbits: int, shift: int, with_ninv: bool):
    t = _scale_shift_np(nbits, shift, with_ninv)
    return GL(*_u64_cols_to_pair(t))


def _scale_shift_vec(nbits: int, shift: int, with_ninv: bool):
    """(1/N?) * shift^i vector of length 2^nbits as a GL column."""
    if _trace_clean():
        return _scale_shift_vec_dev(nbits, shift, with_ninv)
    return GL(*_u64_cols_to_pair(_scale_shift_np(nbits, shift, with_ninv)))


def extend_pol_tpu(a: GL, n_bits: int, n_bits_ext: int, shift: int = SHIFT,
                   interpret: bool = False) -> GL:
    """Coset LDE, same semantics as ops/ntt.extend_pol (reference
    NTT_Goldilocks::extendPol, starks.cpp:52) on the Pallas path.

    The INTT's 1/N and the coset powers shift^i fuse into one multiply.
    """
    shape = a.shape
    a2 = a.reshape(shape[0], -1) if a.lo.ndim != 2 else a
    n, c = a2.shape
    assert n == 1 << n_bits
    n_ext = 1 << n_bits_ext
    coeffs = ntt_tpu(a2, inverse=True, scale=1, interpret=interpret)
    sv = _scale_shift_vec(n_bits, shift, True)
    coeffs = gl.mul(coeffs, GL(jnp.broadcast_to(sv.lo, (n, c)),
                               jnp.broadcast_to(sv.hi, (n, c))))
    padded = GL(
        jnp.concatenate([coeffs.lo, jnp.zeros((n_ext - n, c), jnp.uint32)]),
        jnp.concatenate([coeffs.hi, jnp.zeros((n_ext - n, c), jnp.uint32)]),
    )
    out = ntt_tpu(padded, inverse=False, interpret=interpret)
    if a.lo.ndim == 1:
        return out.reshape(n_ext)
    if a.lo.ndim == 2:
        return out
    return out.reshape(n_ext, *shape[1:])


def available() -> bool:
    if not HAVE_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False

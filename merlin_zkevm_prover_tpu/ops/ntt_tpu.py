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
from .poseidon_tpu import _gl_mul as _gl_mul_lazy  # uint32-limb field mul


def _gl_mul(a, b):
    """Field mul with CANONICAL output.

    poseidon_tpu._reduce128 defers canonicalization (residues in
    [0, 2^64)), which is sound inside the Poseidon kernel's analyzed
    value domains — but this module's _gl_add/_gl_sub carry chains are
    exact only for canonical (< p) operands: two near-2^64 inputs can
    overflow the epsilon-correction's second-order carry and silently
    drop 2^64 ≡ ε.  Random data hits the [p, 2^64) window with
    probability ~2^-32 per op (which is how it survived bit-exactness
    tests against the jnp path); structured data — one-hot columns, the
    zkEVM's sparse trace — hits it constantly.  One compare+select per
    mul restores the all-canonical invariant end to end."""
    lo, hi = _gl_mul_lazy(a, b)
    ge = (hi == np.uint32(0xFFFFFFFF)) & (lo != 0)
    return (jnp.where(ge, lo - np.uint32(1), lo),
            jnp.where(ge, jnp.zeros_like(hi), hi))

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
    if _pipeline_ok(nbits):
        cs = None if (scale is None or scale == 1) else int(scale)
        return _ntt_v2(a2, nbits, inverse, const_scale=cs,
                       interpret=interpret).reshape(*shape)
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
    if (n_bits_ext == n_bits + 1 and _pipeline_ok(n_bits)
            and _pipeline_ok(n_bits_ext)):
        out = extend_pol_tpu_v2(a2, n_bits, n_bits_ext, shift, interpret)
        if a.lo.ndim == 1:
            return out.reshape(n_ext)
        if a.lo.ndim == 2:
            return out
        return out.reshape(n_ext, *shape[1:])
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


# ---------------------------------------------------------------------------
# v2 pipeline: DIF -> one gather -> DIT (three HBM passes per transform)
# ---------------------------------------------------------------------------
#
# The v1 path above costs six HBM passes per transform: [bitrev gather]
# [kernel A][twiddle][transpose][bitrev gather][kernel B].  The v2 pipeline
# removes every standalone pass:
#
#   * kernel A runs decimation-in-frequency (natural input -> bit-reversed
#     output), so the input gather disappears;
#   * the four-step twiddle w_N^(k1*i2) is applied inside kernel A's
#     epilogue from a host table pre-permuted to the DIF output order;
#   * the single mid gather fuses the transpose, the k1 un-reversal and the
#     i2 bit-reversal the DIT kernel wants;
#   * kernel B runs decimation-in-time (bit-reversed input -> natural
#     output) with an optional separable scale epilogue u[k2]*v[k1]: the
#     INTT 1/N and the coset shift^k of extendPol factor as
#     (shift^n1)^k2 * shift^k1 / N since k = k2*n1 + k1;
#   * stages are radix-4 (two radix-2 stages fused), halving the number of
#     VMEM restructuring passes inside the kernels;
#   * extendPol's zero-padding vanishes: the padded (2N, C) matrix reshaped
#     to (n1, n2*C) is zero exactly in rows i1 >= n1/2, so the forward
#     kernel A reads only the lower half and synthesizes its first DIF
#     stage as copy / twiddle-multiply (`zero_top`).


def _rev_perm_np(nbits: int) -> np.ndarray:
    return _bitrev(nbits)


@functools.lru_cache(maxsize=None)
def _gather_twiddle_np(n1_bits: int, n2_bits: int, inverse: bool):
    """(N2, N1) table T[s, k1] = w_N^(k1 * rev2(s)): the four-step twiddle
    in the mid-gather's output layout."""
    t = _fourstep_twiddle_np(n1_bits, n2_bits, inverse)  # [k1, i2]
    return np.ascontiguousarray(t[:, _bitrev(n2_bits)].T)


@functools.lru_cache(maxsize=None)
def _gather_twiddle_dev(n1_bits: int, n2_bits: int, inverse: bool):
    t = _gather_twiddle_np(n1_bits, n2_bits, inverse)
    return (
        jnp.asarray((t & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((t >> np.uint64(32)).astype(np.uint32)),
    )


def _gather_twiddle(n1_bits: int, n2_bits: int, inverse: bool):
    if _trace_clean():
        return _gather_twiddle_dev(n1_bits, n2_bits, inverse)
    t = _gather_twiddle_np(n1_bits, n2_bits, inverse)
    return (
        jnp.asarray((t & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((t >> np.uint64(32)).astype(np.uint32)),
    )


@functools.lru_cache(maxsize=None)
def _sep_scale_np(nbits: int, n1_bits: int, base: int, with_ninv: bool):
    """u[k2], v[k1] with u[k2]*v[k1] = (1/N?) * base^(k2*n1 + k1)."""
    n1 = 1 << n1_bits
    n2 = 1 << (nbits - n1_bits)
    u = gl.powers_np(pow(base, n1, P), n2)
    if with_ninv:
        ninv = pow(1 << nbits, P - 2, P)
        u = (u.astype(object) * ninv % P).astype(np.uint64)
    v = gl.powers_np(base, n1)
    return u, v


def _canon_pair(lo, hi):
    ge = (hi == np.uint32(0xFFFFFFFF)) & (lo != 0)
    return (jnp.where(ge, lo - np.uint32(1), lo),
            jnp.where(ge, jnp.zeros_like(hi), hi))


def _stage_halves(nbits: int, dif: bool):
    """Stage plan as a list of ('r4', m) / ('r2', m) entries, where m is the
    (smaller) half size of the fused pair for r4."""
    if dif:
        halves = [1 << (nbits - s) for s in range(1, nbits + 1)]  # descending
    else:
        halves = [1 << (s - 1) for s in range(1, nbits + 1)]  # ascending
    plan = []
    i = 0
    if not dif and nbits % 2 == 1:
        plan.append(("r2", halves[0]))
        i = 1
    while i + 1 < len(halves):
        m = min(halves[i], halves[i + 1])
        plan.append(("r4", m))
        i += 2
    if i < len(halves):
        plan.append(("r2", halves[i]))
    return plan


def _ntt_kernel_v2(nbits: int, dif: bool, zero_top: bool,
                   sep_scale: bool, canon: bool,
                   const_scale: int | None):
    """One full length-2^nbits transform over the leading axis of a VMEM
    block, radix-4 stages, with optional fused epilogues.

    Inputs (refs, in order): stage tables (lo, hi); [sep row table u (L, 1)
    lo/hi]; [sep col table v (1, bc) lo/hi]; data lo/hi; outputs lo/hi.
    """
    l = 1 << nbits

    def kernel(*refs):
        it = iter(refs)
        tw_lo_ref, tw_hi_ref = next(it), next(it)
        if sep_scale:
            u_lo_ref, u_hi_ref = next(it), next(it)
            v_lo_ref, v_hi_ref = next(it), next(it)
        lo_ref, hi_ref = next(it), next(it)
        out_lo_ref, out_hi_ref = next(it), next(it)
        bc = out_lo_ref.shape[1]

        plan = _stage_halves(nbits, dif)

        def tw_slice(m):
            # stage-table entries [m-1 : 2m-1) = w_{2m}^j, j < m
            tlo = tw_lo_ref[m - 1: 2 * m - 1]
            thi = tw_hi_ref[m - 1: 2 * m - 1]
            return tlo.reshape(1, m, 1), thi.reshape(1, m, 1)

        def bmul(x, tl, th):
            g = x[0].shape[0]
            m = x[0].shape[1]
            tl = jnp.broadcast_to(tl, (g, m, bc))
            th = jnp.broadcast_to(th, (g, m, bc))
            return _gl_mul(x, (tl, th))

        def stage_r2(x, m):
            # x: (l, bc) pair; radix-2 stage with half m
            g = l // (2 * m)
            rlo = x[0].reshape(g, 2, m, bc)
            rhi = x[1].reshape(g, 2, m, bc)
            u = (rlo[:, 0], rhi[:, 0])
            v = (rlo[:, 1], rhi[:, 1])
            tl, th = tw_slice(m)
            if dif:
                a = _gl_add(u, v)
                b = _gl_sub(u, v)
                if m > 1:
                    b = bmul(b, tl, th)
            else:
                if m > 1:
                    v = bmul(v, tl, th)
                a = _gl_add(u, v)
                b = _gl_sub(u, v)
            return (jnp.stack([a[0], b[0]], axis=1).reshape(l, bc),
                    jnp.stack([a[1], b[1]], axis=1).reshape(l, bc))

        def stage_r4(x, m):
            g = l // (4 * m)
            rlo = x[0].reshape(g, 4, m, bc)
            rhi = x[1].reshape(g, 4, m, bc)
            x0 = (rlo[:, 0], rhi[:, 0])
            x1 = (rlo[:, 1], rhi[:, 1])
            x2 = (rlo[:, 2], rhi[:, 2])
            x3 = (rlo[:, 3], rhi[:, 3])
            w2l, w2h = tw_slice(m)  # w_{2m}^j
            # w_{4m}^j and w_{4m}^(j+m): halves of table [2m-1 : 4m-1)
            w4al = tw_lo_ref[2 * m - 1: 3 * m - 1].reshape(1, m, 1)
            w4ah = tw_hi_ref[2 * m - 1: 3 * m - 1].reshape(1, m, 1)
            w4bl = tw_lo_ref[3 * m - 1: 4 * m - 1].reshape(1, m, 1)
            w4bh = tw_hi_ref[3 * m - 1: 4 * m - 1].reshape(1, m, 1)
            if dif:
                # stage half 2m then half m
                a0 = _gl_add(x0, x2)
                a1 = _gl_add(x1, x3)
                b0 = bmul(_gl_sub(x0, x2), w4al, w4ah)
                b1 = bmul(_gl_sub(x1, x3), w4bl, w4bh)
                o0 = _gl_add(a0, a1)
                o1 = _gl_sub(a0, a1)
                o2 = _gl_add(b0, b1)
                o3 = _gl_sub(b0, b1)
                if m > 1:
                    o1 = bmul(o1, w2l, w2h)
                    o3 = bmul(o3, w2l, w2h)
            else:
                # stage half m then half 2m
                if m > 1:
                    x1 = bmul(x1, w2l, w2h)
                    x3 = bmul(x3, w2l, w2h)
                y0a = _gl_add(x0, x1)
                y0b = _gl_sub(x0, x1)
                y1a = bmul(_gl_add(x2, x3), w4al, w4ah)
                y1b = bmul(_gl_sub(x2, x3), w4bl, w4bh)
                o0 = _gl_add(y0a, y1a)
                o1 = _gl_add(y0b, y1b)
                o2 = _gl_sub(y0a, y1a)
                o3 = _gl_sub(y0b, y1b)
            return (
                jnp.stack([o0[0], o1[0], o2[0], o3[0]], axis=1)
                .reshape(l, bc),
                jnp.stack([o0[1], o1[1], o2[1], o3[1]], axis=1)
                .reshape(l, bc),
            )

        def epilogue(x):
            lo, hi = x
            if sep_scale:
                ul = jnp.broadcast_to(u_lo_ref[:], (l, bc))
                uh = jnp.broadcast_to(u_hi_ref[:], (l, bc))
                lo, hi = _gl_mul((lo, hi), (ul, uh))
                vl = jnp.broadcast_to(v_lo_ref[:], (l, bc))
                vh = jnp.broadcast_to(v_hi_ref[:], (l, bc))
                lo, hi = _gl_mul((lo, hi), (vl, vh))
            if const_scale is not None:
                sl = jnp.full((l, bc), np.uint32(const_scale & 0xFFFFFFFF))
                sh = jnp.full((l, bc), np.uint32(const_scale >> 32))
                lo, hi = _gl_mul((lo, hi), (sl, sh))
            if canon:
                lo, hi = _canon_pair(lo, hi)
            return lo, hi

        def body(s0_lo, s0_hi, s1_lo, s1_hi):
            bufs = [(s0_lo, s0_hi), (s1_lo, s1_hi)]
            if zero_top:
                # first DIF stage from the half-height input: top half is
                # zero, so out[j] = x[j], out[j+L/2] = x[j] * w_L^j
                assert dif
                m0 = l // 2
                xlo = lo_ref[:]
                xhi = hi_ref[:]
                tl = tw_lo_ref[m0 - 1: 2 * m0 - 1].reshape(m0, 1)
                th = tw_hi_ref[m0 - 1: 2 * m0 - 1].reshape(m0, 1)
                blo, bhi = _gl_mul(
                    (xlo, xhi),
                    (jnp.broadcast_to(tl, (m0, bc)),
                     jnp.broadcast_to(th, (m0, bc))),
                )
                cur = (jnp.concatenate([xlo, blo], axis=0),
                       jnp.concatenate([xhi, bhi], axis=0))
                plan_rest = _stage_halves(nbits - 1, True)
                # run remaining DIF stages (halves L/4..1) on each half —
                # they never cross the L/2 boundary, so operate on (l, bc)
                # directly with the same reshape structure
                stages = plan_rest
            else:
                cur = (lo_ref[:], hi_ref[:])
                stages = plan

            write_idx = 0
            for si, (kind, m) in enumerate(stages):
                if kind == "r4":
                    cur = stage_r4(cur, m)
                else:
                    cur = stage_r2(cur, m)
                if si < len(stages) - 1:
                    buf = bufs[write_idx % 2]
                    buf[0][:] = cur[0]
                    buf[1][:] = cur[1]
                    cur = (buf[0][:], buf[1][:])
                    write_idx += 1
            lo, hi = epilogue(cur)
            out_lo_ref[:] = lo
            out_hi_ref[:] = hi

        pl.run_scoped(
            body,
            s0_lo=pltpu.VMEM((l, _BC), jnp.uint32),
            s0_hi=pltpu.VMEM((l, _BC), jnp.uint32),
            s1_lo=pltpu.VMEM((l, _BC), jnp.uint32),
            s1_hi=pltpu.VMEM((l, _BC), jnp.uint32),
        )

    return kernel


# ---------------------------------------------------------------------------
# v3 kernel: SSA over 8-row register values (no whole-block restructuring)
# ---------------------------------------------------------------------------
#
# The v2 kernel operates on whole (l, bc) VMEM tensors; every stage's
# reshape/slice/stack is a full-block relayout, and measurement shows those
# copies — not the butterfly arithmetic — dominate (stage cost is flat in m).
# The v3 kernel mirrors the Poseidon kernel's structure instead: the block
# lives as l/8 SSA values of shape (8, bc) (vector registers, spilled only
# at stage granularity).  Butterflies with stride >= 8 rows pair VALUES —
# pure SSA renaming, zero data movement.  The last three stages (stride
# 4/2/1, inside a value's sublanes) use a roll+select formulation: partner
# p[s] = x[s^m] from two sublane rolls and an iota mask, one full-width
# twiddle multiply with the per-sublane constant vector baked in at build
# time (sign-folded so high rows multiply by p - w), and a sublane select.


_SC_OFF = {4: 0, 2: 8, 1: 16}


@functools.lru_cache(maxsize=None)
def _small_stage_consts_np(nbits: int, inverse: bool, dif: bool):
    """(24,) uint64 sublane-stage multiplier table, rows 8k..8k+7 for the
    stage with half m where _SC_OFF[m] == 8k: entry s is 1 on low rows and
    (p - w_{2m}^(s & (m-1))) (DIF, sign folded) or w_{2m}^(s & (m-1)) (DIT)
    on high rows."""
    tbl = _stage_tables_np(nbits, inverse)
    out = np.ones(24, dtype=np.uint64)
    for m, off in _SC_OFF.items():
        for s in range(8):
            if s & m:
                w = int(tbl[m - 1 + (s & (m - 1))])
                out[off + s] = (P - w) % P if dif else w
    return out


def _small_stage_consts(nbits: int, inverse: bool, dif: bool):
    t = _small_stage_consts_np(nbits, inverse, dif)
    return (
        jnp.asarray((t & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None]),
        jnp.asarray((t >> np.uint64(32)).astype(np.uint32)[:, None]),
    )


def _ntt_kernel_v3(nbits: int, dif: bool, zero_top: bool,
                   sep_scale: bool, canon: bool,
                   const_scale: int | None, inverse: bool):
    """Same ref signature/semantics as _ntt_kernel_v2, SSA formulation."""
    l = 1 << nbits
    g = l // 8
    assert l >= 16 and g >= 2

    def kernel(*refs):
        it = iter(refs)
        tw_lo_ref, tw_hi_ref = next(it), next(it)
        sc_lo_ref, sc_hi_ref = next(it), next(it)
        if sep_scale:
            u_lo_ref, u_hi_ref = next(it), next(it)
            v_lo_ref, v_hi_ref = next(it), next(it)
        lo_ref, hi_ref = next(it), next(it)
        out_lo_ref, out_hi_ref = next(it), next(it)
        bc = out_lo_ref.shape[1]

        def tw8(m, i):
            # (8, bc)-broadcast twiddle rows j = i*8..i*8+7 of stage half m
            o = m - 1 + i * 8
            tl = tw_lo_ref[o: o + 8].reshape(8, 1)
            th = tw_hi_ref[o: o + 8].reshape(8, 1)
            return (jnp.broadcast_to(tl, (8, bc)),
                    jnp.broadcast_to(th, (8, bc)))

        sub_iota = jax.lax.broadcasted_iota(jnp.uint32, (8, bc), 0)

        def partner(x, m):
            if m == 4:
                return (jnp.roll(x[0], 4, axis=0), jnp.roll(x[1], 4, axis=0))
            low = (sub_iota & np.uint32(m)) == 0
            return (
                jnp.where(low, jnp.roll(x[0], -m, axis=0),
                          jnp.roll(x[0], m, axis=0)),
                jnp.where(low, jnp.roll(x[1], -m, axis=0),
                          jnp.roll(x[1], m, axis=0)),
            )

        def sublane_stage(x, m):
            low = (sub_iota & np.uint32(m)) == 0
            off = _SC_OFF[m]
            c = (jnp.broadcast_to(
                     sc_lo_ref[off: off + 8].reshape(8, 1), (8, bc)),
                 jnp.broadcast_to(
                     sc_hi_ref[off: off + 8].reshape(8, 1), (8, bc)))
            if dif:
                p = partner(x, m)
                s = _gl_add(x, p)
                d = _gl_sub(x, p)
                d = _gl_mul(d, c)
                return (jnp.where(low, s[0], d[0]),
                        jnp.where(low, s[1], d[1]))
            t = _gl_mul(x, c)
            p = partner(t, m)
            s = _gl_add(t, p)
            d = _gl_sub(p, t)
            return (jnp.where(low, s[0], d[0]),
                    jnp.where(low, s[1], d[1]))

        # ---- load values ----
        in_g = g // 2 if zero_top else g
        vals = [None] * g
        for i in range(in_g):
            vals[i] = (lo_ref[8 * i: 8 * i + 8, :], hi_ref[8 * i: 8 * i + 8, :])

        # ---- stage plan ----
        if dif:
            value_halves = [1 << s for s in range(nbits - 1, 2, -1)]
            first = True
            for m in value_halves:
                mm = m // 8
                if zero_top and first:
                    # top half of the input is zero: butterfly degenerates
                    # to copy / twiddle-multiply of the lower half
                    for i in range(g // 2):
                        u = vals[i]
                        vals[i + g // 2] = _gl_mul(u, tw8(m, i % mm))
                    first = False
                    continue
                for b0 in range(0, g, 2 * mm):
                    for i in range(mm):
                        u = vals[b0 + i]
                        v = vals[b0 + mm + i]
                        a = _gl_add(u, v)
                        d = _gl_sub(u, v)
                        vals[b0 + i] = a
                        vals[b0 + mm + i] = _gl_mul(d, tw8(m, i))
                first = False
            for m in (4, 2, 1):
                for i in range(g):
                    vals[i] = sublane_stage(vals[i], m)
        else:
            for m in (1, 2, 4):
                for i in range(g):
                    vals[i] = sublane_stage(vals[i], m)
            for m in [1 << s for s in range(3, nbits)]:
                mm = m // 8
                for b0 in range(0, g, 2 * mm):
                    for i in range(mm):
                        u = vals[b0 + i]
                        v = _gl_mul(vals[b0 + mm + i], tw8(m, i))
                        vals[b0 + i] = _gl_add(u, v)
                        vals[b0 + mm + i] = _gl_sub(u, v)

        # ---- epilogue + store ----
        for i in range(g):
            x = vals[i]
            if sep_scale:
                ul = u_lo_ref[8 * i: 8 * i + 8].reshape(8, 1)
                uh = u_hi_ref[8 * i: 8 * i + 8].reshape(8, 1)
                x = _gl_mul(x, (jnp.broadcast_to(ul, (8, bc)),
                                jnp.broadcast_to(uh, (8, bc))))
                x = _gl_mul(x, (v_lo_ref[0:1, :] + jnp.zeros((8, bc),
                                                             jnp.uint32),
                                v_hi_ref[0:1, :] + jnp.zeros((8, bc),
                                                             jnp.uint32)))
            if const_scale is not None:
                sl = jnp.full((8, bc), np.uint32(const_scale & 0xFFFFFFFF))
                sh = jnp.full((8, bc), np.uint32(const_scale >> 32))
                x = _gl_mul(x, (sl, sh))
            if canon:
                x = _canon_pair(x[0], x[1])
            out_lo_ref[8 * i: 8 * i + 8, :] = x[0]
            out_hi_ref[8 * i: 8 * i + 8, :] = x[1]

    return kernel


_V3 = True  # SSA kernel default; flip for A/B comparison


@functools.lru_cache(maxsize=None)
def _ntt_call_v2(nbits: int, n_blocks: int, dif: bool, zero_top: bool,
                 sep: bool, canon: bool, const_scale, interpret: bool,
                 inverse: bool = False, v3: bool | None = None):
    """pallas_call wrapper for the v2/v3 kernels."""
    l = 1 << nbits
    tw_len = max(l - 1, 1)
    in_l = l // 2 if zero_top else l
    if v3 is None:
        v3 = _V3
    if l < 16:
        v3 = False  # SSA form needs >= 2 eight-row values

    def fn(tw_lo, tw_hi, extras, lo, hi):
        in_specs = [
            pl.BlockSpec((tw_len, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw_len, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [tw_lo, tw_hi]
        if v3:
            sc_lo, sc_hi = _small_stage_consts(nbits, inverse, dif)
            in_specs += [
                pl.BlockSpec((24, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((24, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            args += [sc_lo, sc_hi]
        if sep:
            in_specs += [
                pl.BlockSpec((l, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _BC), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _BC), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ]
            args += [extras["u_lo"], extras["u_hi"],
                     extras["v_lo"], extras["v_hi"]]
        in_specs += [
            pl.BlockSpec((in_l, _BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_l, _BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        args += [lo, hi]
        if v3:
            kern = _ntt_kernel_v3(nbits, dif, zero_top, sep, canon,
                                  const_scale, inverse)
        else:
            kern = _ntt_kernel_v2(nbits, dif, zero_top, sep, canon,
                                  const_scale)
        return pl.pallas_call(
            kern,
            grid=(n_blocks,),
            interpret=interpret,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((l, _BC), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l, _BC), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((l, n_blocks * _BC), jnp.uint32),
                jax.ShapeDtypeStruct((l, n_blocks * _BC), jnp.uint32),
            ],
        )(*args)

    def traced(tw_lo, tw_hi, extras, lo, hi):
        with jax.enable_x64(False):
            return fn(tw_lo, tw_hi, extras, lo, hi)

    return jax.jit(traced, static_argnames=())


def _pad_cols(lo, hi, bc):
    b = lo.shape[1]
    pad = (-b) % bc
    if pad:
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
    return lo, hi, b


@functools.lru_cache(maxsize=None)
def _mid_gather_idx_np(n1_bits: int, n2_bits: int) -> np.ndarray:
    """Flat (n2*n1,) row indices realising transpose + rev1-unreversal +
    rev2-reversal as ONE gather: out flat row s*n1 + k1 reads input flat
    row rev1(k1)*n2 + rev2(s)."""
    rev1 = _bitrev(n1_bits).astype(np.int32)
    rev2 = _bitrev(n2_bits).astype(np.int32)
    return (rev2[:, None] + (rev1[None, :] << n2_bits)).reshape(-1)


def _mid_gather(lo, hi, n1_bits: int, n2_bits: int, c: int, inverse: bool):
    """Fused transpose + k1 un-reversal + i2 bit-reversal + four-step
    twiddle between the DIF and DIT kernels:
    z[s, k1, c] = y[rev1(k1), rev2(s), c] * w_N^(k1 * rev2(s))."""
    n1, n2 = 1 << n1_bits, 1 << n2_bits
    idx = jnp.asarray(_mid_gather_idx_np(n1_bits, n2_bits))

    def g(x):
        return jnp.take(x.reshape(n1 * n2, c), idx, axis=0).reshape(
            n2, n1, c)

    z = (g(lo), g(hi))  # (n2, n1, c)
    t_lo, t_hi = _gather_twiddle(n1_bits, n2_bits, inverse)  # (n2, n1)
    z = _gl_mul(z, (jnp.broadcast_to(t_lo[:, :, None], (n2, n1, c)),
                    jnp.broadcast_to(t_hi[:, :, None], (n2, n1, c))))
    return (z[0].reshape(n2, n1 * c), z[1].reshape(n2, n1 * c))


def _pipeline_ok(nbits: int) -> bool:
    # lower bound keeps kernel-A blocks at Mosaic-friendly sublane counts
    return 10 <= nbits <= 2 * MAX_KERNEL_BITS


def _ntt_v2(a2: GL, nbits: int, inverse: bool, *,
            sep_scale_base: int | None = None, with_ninv: bool = False,
            const_scale: int | None = None, zero_top: bool = False,
            canon: bool = True, interpret: bool = False) -> GL:
    """Length-2^nbits transform over axis 0 of (N, C) (or (N/2, C) input
    when zero_top) via the 3-pass DIF/DIT pipeline."""
    n = 1 << nbits
    c = a2.shape[1]
    n2_bits = min(MAX_KERNEL_BITS, nbits - 1)
    n1_bits = nbits - n2_bits
    assert n1_bits <= MAX_KERNEL_BITS
    n1, n2 = 1 << n1_bits, 1 << n2_bits

    # ---- kernel A: DIF over i1 ----
    in_rows = n1 // 2 if zero_top else n1
    lo = a2.lo.reshape(in_rows, n2 * c)
    hi = a2.hi.reshape(in_rows, n2 * c)
    lo, hi, b = _pad_cols(lo, hi, _BC)
    n_blocks = lo.shape[1] // _BC
    tw_lo, tw_hi = _stage_tables(n1_bits, inverse)
    y_lo, y_hi = _ntt_call_v2(n1_bits, n_blocks, True, zero_top,
                              False, False, None, interpret, inverse)(
        tw_lo, tw_hi, {}, lo, hi)
    y_lo, y_hi = y_lo[:, :b], y_hi[:, :b]

    # ---- mid gather (transpose + un-rev + rev + four-step twiddle) ----
    z_lo, z_hi = _mid_gather(y_lo, y_hi, n1_bits, n2_bits, c, inverse)

    # ---- kernel B: DIT over i2, fused separable scale ----
    z_lo, z_hi, b2 = _pad_cols(z_lo, z_hi, _BC)
    n_blocks2 = z_lo.shape[1] // _BC
    extras2 = {}
    sep = sep_scale_base is not None
    if sep:
        u_np, v_np = _sep_scale_np(nbits, n1_bits, sep_scale_base, with_ninv)
        extras2["u_lo"] = jnp.asarray(
            (u_np & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None])
        extras2["u_hi"] = jnp.asarray(
            (u_np >> np.uint64(32)).astype(np.uint32)[:, None])
        v_full = np.repeat(v_np, c)  # (n1*c,)
        pad_v = (-v_full.shape[0]) % _BC
        if pad_v:
            v_full = np.concatenate(
                [v_full, np.zeros(pad_v, dtype=np.uint64)])
        extras2["v_lo"] = jnp.asarray(
            (v_full & np.uint64(0xFFFFFFFF)).astype(np.uint32)[None, :])
        extras2["v_hi"] = jnp.asarray(
            (v_full >> np.uint64(32)).astype(np.uint32)[None, :])
    tw2_lo, tw2_hi = _stage_tables(n2_bits, inverse)
    out_lo, out_hi = _ntt_call_v2(n2_bits, n_blocks2, False, False,
                                  sep, canon, const_scale, interpret,
                                  inverse)(
        tw2_lo, tw2_hi, extras2, z_lo, z_hi)
    out_lo, out_hi = out_lo[:, :b2], out_hi[:, :b2]
    return GL(out_lo.reshape(n, c), out_hi.reshape(n, c))


def ntt_tpu_v2(a: GL, inverse: bool = False, interpret: bool = False) -> GL:
    """Natural-order NTT/INTT via the 3-pass pipeline (nbits in [4, 18])."""
    shape = a.shape
    n = shape[0]
    nbits = int(n).bit_length() - 1
    assert (1 << nbits) == n and _pipeline_ok(nbits)
    a2 = a.reshape(n, -1) if a.lo.ndim != 2 else a
    const_scale = pow(n, P - 2, P) if inverse else None
    out = _ntt_v2(a2, nbits, inverse, const_scale=const_scale,
                  interpret=interpret)
    return out.reshape(*shape)


def extend_pol_tpu_v2(a: GL, n_bits: int, n_bits_ext: int,
                      shift: int = SHIFT, interpret: bool = False) -> GL:
    """Coset LDE via two 3-pass pipelines with all glue fused:
    INTT (sep-scale epilogue: shift^k / N) -> forward NTT with zero_top."""
    shape = a.shape
    a2 = a.reshape(shape[0], -1) if a.lo.ndim != 2 else a
    n, c = a2.shape
    assert n == 1 << n_bits
    assert n_bits_ext == n_bits + 1, "v2 LDE path is specialised to blowup 2"
    n_ext = 1 << n_bits_ext
    # INTT with fused (1/N) * shift^k output scale, natural-order coeffs
    coeffs = _ntt_v2(a2, n_bits, True, sep_scale_base=shift, with_ninv=True,
                     canon=False, interpret=interpret)
    # forward NTT at 2N: padded input's (n1, n2*c) reshape is zero for
    # i1 >= n1/2, so pass the (N, c) coeffs directly with zero_top
    out = _ntt_v2(coeffs, n_bits_ext, False, zero_top=True, canon=True,
                  interpret=interpret)
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

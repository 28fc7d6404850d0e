"""Headline benchmark: batch STARK commit stage (LDE + Poseidon Merkle).

Measures the reference's hot loops #2/#3 (SURVEY §3.1: NTT/LDE of the
committed-polynomial matrix + Merkle tree build, starks.cpp:52-59) as one
fused device pipeline, and prints ONE JSON line:

  {"metric": ..., "value": ..., "unit": "felts/s", "vs_baseline": ...}

vs_baseline normalizes against an estimated 2.0e9 felts/s for the same
LDE+commit stage on the 64-core AVX2 reference (the reference publishes no
numbers — BASELINE.md; estimate: ~35 M Poseidon permutations/s across 64
AVX2 cores on the rate-8 sponge dominating the stage).

Env overrides: BENCH_NBITS (default 18), BENCH_COLS (64), BENCH_ITERS (3).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from merlin_zkevm_prover_tpu.ops import goldilocks as gl
    from merlin_zkevm_prover_tpu.ops import ntt as nttmod
    from merlin_zkevm_prover_tpu.ops import poseidon_gl

    n_bits = int(os.environ.get("BENCH_NBITS", "17"))
    cols = int(os.environ.get("BENCH_COLS", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    blowup_bits = 1
    n = 1 << n_bits
    n_ext = n << blowup_bits

    print(
        f"bench: device={jax.devices()[0]} trace=2^{n_bits}x{cols} "
        f"blowup=2^{blowup_bits}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    trace = gl.from_u64(rng.integers(0, gl.P, (n, cols), dtype=np.uint64))

    def commit(tr):
        lde = nttmod.extend_pol(tr, n_bits, n_bits + blowup_bits)
        nodes = poseidon_gl.merkelize_best(lde)
        return nodes[-1]

    fn = jax.jit(commit)
    t0 = time.time()
    root = gl.to_u64(fn(trace))
    compile_s = time.time() - t0
    print(f"bench: compile+first run {compile_s:.1f}s", file=sys.stderr)

    # vary the input each iteration (cheap on-device perturbation) so no
    # layer can serve a cached result for an identical computation
    import jax.numpy as jnp

    def step(tr, i):
        tr2 = gl.GL(tr.lo.at[0, 0].set(i), tr.hi.at[0, 0].set(0))
        return commit(tr2)

    stepf = jax.jit(step)
    # warm up with a real result fetch: under the axon tunnel,
    # block_until_ready does not wait — only data fetches do
    _ = gl.to_u64(stepf(trace, np.uint32(1)))
    t0 = time.time()
    for k in range(iters):
        root_np = gl.to_u64(stepf(trace, np.uint32(2 + k)))
    dt = (time.time() - t0) / iters

    felts = n_ext * cols  # committed felts per stage (post-LDE matrix)
    value = felts / dt
    baseline = 2.0e9
    out = {
        "metric": "stark_commit_lde_merkle_felts_per_s",
        "value": round(value, 1),
        "unit": "felts/s",
        "vs_baseline": round(value / baseline, 4),
    }
    print(
        f"bench: {dt*1e3:.1f} ms/commit of {felts/1e6:.1f}M felts",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Headline benchmark: batch STARK commit stage (LDE + Poseidon Merkle).

Measures the reference's hot loops #2/#3 (SURVEY §3.1: NTT/LDE of the
committed-polynomial matrix + Merkle tree build, starks.cpp:52-59) as one
fused device pipeline, and prints ONE JSON line:

  {"metric": ..., "value": ..., "unit": "felts/s", "vs_baseline": ...}

Baseline derivation (the reference publishes no numbers — BASELINE.md):
the same stage on the 64-core AVX2 reference costs
  * Merkle: (2^18 leaf linear-hashes x 8 rate-8 sponge permutations +
    2^18 node permutations) = 2.36M Poseidon permutations at ~0.55M
    permutations/s/core AVX2 (~35M/s across 64 cores)        ~ 67 ms
  * LDE: INTT(2^17) + NTT(2^18) x 64 cols = 222M butterflies at
    ~150M butterflies/s/core                                  ~ 23 ms
  -> ~90 ms per 16.8M-felt commit = ~1.9e8 felts/s; baseline 2.0e8.
(BENCH_r01/r02 used 2.0e9 — a 10x slip against the same ~35M perms/s
footnote: 35e6 perms/s x rate 8 = 2.8e8 absorbed felts/s, not 2.8e9.)

Timing protocol: iterations are CHAINED on device (each commit's input is
perturbed by the previous root) and fetched once at the end — the axon
tunnel's device->host fetch costs a measured ~33 ms, which is transfer
latency, not compute, and a production prover pipelines commits without
per-stage host syncs.

Env overrides: BENCH_NBITS (default 17), BENCH_COLS (64), BENCH_ITERS (8).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        # persistent compile cache (safe on the TPU runtime; avoids paying
        # the ~2 min commit-pipeline compile on every bench invocation)
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("MERLIN_COMPILE_CACHE",
                                         "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from merlin_zkevm_prover_tpu.ops import goldilocks as gl
    from merlin_zkevm_prover_tpu.ops import ntt as nttmod
    from merlin_zkevm_prover_tpu.ops import poseidon_gl

    n_bits = int(os.environ.get("BENCH_NBITS", "17"))
    cols = int(os.environ.get("BENCH_COLS", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
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

    def step(tr, i):
        # fold the previous root into the input so no layer can serve a
        # cached result; returns the perturbed input for chaining
        tr2 = gl.GL(tr.lo.at[0, 0].set(i), tr.hi.at[0, 0].set(0))
        root = commit(tr2)
        tr3 = gl.GL(tr2.lo.at[0, 1].set(root.lo[0]),
                    tr2.hi.at[0, 1].set(0))
        return tr3, root

    stepf = jax.jit(step)
    t0 = time.time()
    cur, root = stepf(trace, np.uint32(1))
    _ = gl.to_u64(root)
    compile_s = time.time() - t0
    print(f"bench: compile+first run {compile_s:.1f}s", file=sys.stderr)

    # measured tunnel fetch floor is ~33 ms — chain iters, fetch once
    t0 = time.time()
    for k in range(iters):
        cur, root = stepf(cur, np.uint32(2 + k))
    root_np = gl.to_u64(root)
    dt = (time.time() - t0) / iters

    felts = n_ext * cols  # committed felts per stage (post-LDE matrix)
    value = felts / dt
    baseline = 2.0e8
    out = {
        "metric": "stark_commit_lde_merkle_felts_per_s",
        "value": round(value, 1),
        "unit": "felts/s",
        "vs_baseline": round(value / baseline, 4),
    }
    print(
        f"bench: {dt*1e3:.1f} ms/commit of {felts/1e6:.1f}M felts "
        f"(root[0]={root_np[0]})",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

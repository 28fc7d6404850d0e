"""Wrap a saved real zkEVM proof in recursive1 (the c12a/recursive1 role).

Measures the load-bearing cost of the native recursion design on the
REAL 665-column proof — verifier-circuit gate count, plonk12c domain —
then (unless --measure-only) proves and verifies the wrap.

Usage:
    python tools/prove_zkevm.py --nbits 18 --queries 32 --save /tmp/p.json
    python tools/wrap_recursive1.py /tmp/p.json [--measure-only]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("saved", help="proof JSON from prove_zkevm --save")
    ap.add_argument("--measure-only", action="store_true")
    ap.add_argument("--queries", type=int, default=32,
                    help="outer (recursive1) FRI queries")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MERLIN_COMPILE_CACHE",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)

    from merlin_zkevm_prover_tpu.models.zkevm import (
        build_zkevm_air,
        compile_zkevm,
    )
    from merlin_zkevm_prover_tpu.recursion.plonk import plan_layout
    from merlin_zkevm_prover_tpu.recursion.recursive import (
        RecursiveStage,
        build_verifier_circuit,
    )
    from merlin_zkevm_prover_tpu.stark.proof import StarkProof

    d = json.load(open(args.saved))
    proof = StarkProof.from_json(json.dumps(d["proof"]))
    const_root = d["const_root"]

    t0 = time.time()
    air = build_zkevm_air(n_bits=d["n_bits"], reparam_jmpn=d["n_bits"] < 23)
    info = compile_zkevm(air, n_queries=d["n_queries"])
    print(f"inner info rebuilt: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    circuit = build_verifier_circuit([(info, const_root, proof)])
    t_build = time.time() - t0
    lay = plan_layout(circuit)
    print(f"verifier circuit: {len(circuit.gates)} gates, "
          f"{len(circuit.pos_blocks)} poseidon blocks, "
          f"{len(circuit.values)} wires, built in {t_build:.1f}s", flush=True)
    print(f"plonk12c layout: 2^{lay.n_bits} rows "
          f"(pub {lay.n_pub_rows} + gate {lay.n_gate_rows} + "
          f"pos {lay.n_pos_rows})", flush=True)
    if args.measure_only:
        return

    stage = RecursiveStage("recursive1", n_queries=args.queries,
                           fri_fold_bits=3)
    t0 = time.time()
    outer_proof = stage.prove([(info, const_root, proof)])
    from merlin_zkevm_prover_tpu.stark import verify

    verify(stage.info, stage.const_root(), outer_proof)
    print(f"recursive1 proved+verified in {time.time()-t0:.1f}s: "
          f"2^{stage.info.n_bits} x {stage.info.n_cm[0]} cols, "
          f"{stage.info.n_queries} queries", flush=True)


if __name__ == "__main__":
    main()

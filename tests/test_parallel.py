"""Sharded commit pipeline on the 8-device virtual CPU mesh: results must
be bit-identical to the single-device path, with the mesh only changing
layout (XLA inserts the collectives)."""

import numpy as np

from merlin_zkevm_prover_tpu.ops import goldilocks as gl
from merlin_zkevm_prover_tpu.ops import ntt as nttmod
from merlin_zkevm_prover_tpu.ops import poseidon_gl


def test_sharded_commit_matches_single_device():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from merlin_zkevm_prover_tpu.parallel.commit import commit_pipeline
    from merlin_zkevm_prover_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    n_bits, n_bits_ext, cols = 8, 9, 6
    rng = np.random.default_rng(5)
    trace_np = rng.integers(0, gl.P, (1 << n_bits, cols), dtype=np.uint64)
    trace = gl.from_u64(trace_np)

    # single-device reference
    lde_ref = nttmod.extend_pol(trace, n_bits, n_bits_ext)
    nodes_ref = poseidon_gl.merkelize(lde_ref)

    sharded_in = gl.GL(
        jax.device_put(trace.lo, NamedSharding(mesh, P(None, "cols"))),
        jax.device_put(trace.hi, NamedSharding(mesh, P(None, "cols"))),
    )
    fn = jax.jit(
        lambda t: commit_pipeline(t, n_bits, n_bits_ext, mesh)
    )
    lde, nodes = fn(sharded_in)
    np.testing.assert_array_equal(gl.to_u64(lde), gl.to_u64(lde_ref))
    np.testing.assert_array_equal(gl.to_u64(nodes), gl.to_u64(nodes_ref))


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered.as_text().count("\n") > 0

"""Sharded commit pipeline: LDE + Merkle over a device mesh.

The binding constraint in the reference is single-proof memory (44.6 GB of
committed columns, SURVEY §5): it cannot split one proof across nodes.
Here one proof's trace is laid out column-sharded for the NTT (each chip
runs the stage butterflies on its own column block — columns are
embarrassingly parallel), then resharded row-wise (one ICI all-to-all,
inserted by XLA from the sharding constraints) for Poseidon leaf hashing
and per-chip Merkle subtrees; the tiny subtree tops are gathered and
reduced to the root.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import goldilocks as gl
from ..ops import ntt as nttmod
from ..ops import poseidon_gl
from ..ops.goldilocks import GL
from .mesh import constrain_gl, reshard_cols_to_rows, shard_cols, shard_rows


def commit_pipeline(trace: GL, n_bits: int, n_bits_ext: int, mesh: Mesh):
    """LDE + Merkle tree over the mesh.  Returns (lde, nodes).

    Call under jit with `trace` placed column-sharded; the function pins the
    phase layouts so GSPMD emits: local column NTTs -> explicit
    slice+all-gather reshard -> row-local Poseidon -> log-depth node
    reduction.  The col->row reshard is the explicit collective of
    mesh.reshard_cols_to_rows (constraint inference alone forces an
    involuntary full rematerialization here).
    """
    trace = constrain_gl(trace, shard_cols(mesh))
    lde = nttmod.extend_pol(trace, n_bits, n_bits_ext)
    lde = constrain_gl(lde, shard_cols(mesh))
    # reshard rows for hashing (explicit minimal collective)
    lde_rows = reshard_cols_to_rows(lde, mesh)
    leaves = poseidon_gl.linear_hash(lde_rows)
    leaves = constrain_gl(leaves, shard_rows(mesh))
    upper = poseidon_gl.merkle_nodes(leaves)
    nodes = gl.concat([leaves, upper], axis=0)
    return lde, nodes


def jit_commit(mesh: Mesh, n_bits: int, n_bits_ext: int):
    fn = functools.partial(commit_pipeline, n_bits=n_bits,
                           n_bits_ext=n_bits_ext, mesh=mesh)
    return jax.jit(fn)

"""Device-mesh construction and sharding helpers.

The reference scales one proof with OpenMP threads on one node and scales
out only across proofs via gRPC (SURVEY §2.3).  This framework shards a
single proof across TPU chips: rows (the 2^23-row trace) and columns (the
665 committed polynomials) are the two natural axes.

Axes:
  * 'rows' — data-parallel axis for constraint evaluation, Poseidon leaf
    hashing and Merkle subtrees (reference P1/P3).
  * 'cols' — embarrassingly-parallel axis for the column-batched NTT/LDE
    (reference P2): each chip transforms its own column block with zero
    collectives; the row<->col resharding between NTT and Merkle phases is
    one XLA all-to-all over ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.goldilocks import GL


def make_mesh(n_devices: Optional[int] = None,
              rows: Optional[int] = None,
              cols: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if rows is None or cols is None:
        # favor the rows axis; cols axis gets factor 2 when available
        cols = 2 if n % 2 == 0 and n > 1 else 1
        rows = n // cols
    assert rows * cols == n
    return Mesh(np.array(devs).reshape(rows, cols), ("rows", "cols"))


def shard_cols(mesh: Mesh) -> NamedSharding:
    """(N, C) array: rows over 'rows', columns over 'cols' (NTT-friendly:
    the transform axis stays local, columns are embarrassingly parallel)."""
    return NamedSharding(mesh, P(None, "cols"))


def shard_rows(mesh: Mesh) -> NamedSharding:
    """(N, C) array sharded over the row axis (hash/constraint-friendly)."""
    return NamedSharding(mesh, P("rows", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_gl(x: GL, sharding: NamedSharding) -> GL:
    return GL(jax.device_put(x.lo, sharding), jax.device_put(x.hi, sharding))


def constrain_gl(x: GL, sharding) -> GL:
    return GL(
        jax.lax.with_sharding_constraint(x.lo, sharding),
        jax.lax.with_sharding_constraint(x.hi, sharding),
    )

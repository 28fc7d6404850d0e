"""merlin-zkevm-prover-tpu: a TPU-native zkEVM proving framework.

Built from scratch against the capability surface of
MerlinLayer2/merlin-zkevm-prover (C++/AVX2), redesigned for JAX/XLA/Pallas:
Goldilocks field kernels on 32-bit lanes, batched NTT/LDE, Poseidon Merkle
commitments, a data-driven STARK engine, FRI, recursion plumbing, and the
BN254 SNARK finalization — sharded over TPU meshes with XLA collectives.
"""

import jax as _jax

# The field kernels express 64-bit limb algebra through uint64 intermediates
# (XLA lowers them to 32-bit pairs on TPU); the u64 dtype only exists with
# x64 enabled.  All framework arrays use explicit dtypes, so the global
# default-dtype change is benign.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

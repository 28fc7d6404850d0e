"""StarkRecursiveF-equivalent prover: STARK over GL with BN254 commitments.

Reference `StarkRecursiveF::genProof` (src/starkpil/starkRecursiveF/
starkRecursiveF.cpp:194-383) runs the same 5-step pipeline as `Starks` but
commits with the arity-16 Poseidon-BN254 Merkle tree and the Fr-sponge
transcript (friProofC12.hpp:15-26, BN128_ARITY=16), so the proof is cheap
to verify inside a BN254 SNARK circuit.  This module is the framework's
variant: the device pipeline is shared with StarkProver; only the
host-side commitment scheme differs.
"""

from __future__ import annotations

from typing import List, Tuple

from ..ops import goldilocks as gl
from ..ops.goldilocks import GL
from .merkle_bn128 import ARITY, MerkleTreeBN128, TranscriptBN128
from .prover import StarkProver


class TranscriptBN128Adapter(TranscriptBN128):
    """StarkProver expects `get_field() -> [3 GL ints]`."""

    def get_field(self) -> List[int]:
        return self.get_fields_gl(3)


class MerkleTreeBN128GL:
    """MerkleTreeGL-shaped facade over the arity-16 BN254 tree, sourcing
    rows from a device GL matrix."""

    def __init__(self, source: GL):
        self.source = source
        self.height, self.width = source.shape
        self._tree = None

    def merkelize(self) -> None:
        rows_np = gl.to_u64(self.source)
        rows = [[int(v) for v in r] for r in rows_np]
        self._tree = MerkleTreeBN128(rows)

    def root(self) -> List[int]:
        assert self._tree is not None
        return [self._tree.root()]

    def get_group_proof(self, idx: int) -> Tuple[list, List[List[int]]]:
        assert self._tree is not None
        return self._tree.get_group_proof(idx)

    @staticmethod
    def verify_proof(root: List[int], idx: int, row_values, siblings) -> bool:
        return MerkleTreeBN128.verify_proof(
            int(root[0]), idx, [int(v) for v in row_values], siblings
        )


class StarkProverBN128(StarkProver):
    """The recursiveF stage prover (BN254-committed STARK over GL)."""

    tree_cls = MerkleTreeBN128GL
    transcript_cls = TranscriptBN128Adapter

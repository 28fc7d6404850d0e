"""Final SNARK stage: Groth16 over the recursiveF verifier R1CS.

Reference flow (prover.cpp:788-949): recursiveF STARK -> circom final
witness -> rapidsnark Groth16.  Here: StarkProverBN128 proof ->
build_final_r1cs (recursion/final_circuit.py) -> snark/setup + groth16.

The Groth16 proving key depends only on the R1CS shape, which depends only
on the recursiveF StarkInfo — one setup serves every final proof.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..snark import groth16
from ..snark.setup import setup
from ..stark.compiler import StarkInfo
from ..stark.proof import StarkProof
from .final_circuit import build_final_r1cs


class FinalStage:
    """Reusable final-SNARK context for one recursiveF circuit shape.

    `protocol` selects Groth16 or fflonk — the reference picks by the
    zkey's protocol ID (prover.cpp:59,887: 1 = groth16, 10 = fflonk)."""

    def __init__(self, info: StarkInfo, const_root_fr: int,
                 setup_seed: int = 1234, protocol: str = "groth16"):
        assert protocol in ("groth16", "fflonk")
        self.info = info
        self.const_root_fr = int(const_root_fr)
        self.setup_seed = setup_seed
        self.protocol = protocol
        self.key = None
        self.toxic = None

    def _prove_fflonk(self, r1cs, witness) -> Dict:
        from ..snark.fflonk import fflonk_prove, fflonk_setup, fflonk_verify
        from ..snark.r1cs_to_plonk import r1cs_to_plonk

        cs, av, bv, cv = r1cs_to_plonk(r1cs, witness)
        if self.key is None:
            self.key = fflonk_setup(cs, seed=self.setup_seed)
        proof = fflonk_prove(self.key, av, bv, cv)
        assert fflonk_verify(self.key, proof), \
            "final fflonk proof fails verification"
        proof["verified"] = True
        return proof

    def prove(self, proof: StarkProof) -> Dict:
        """Returns the final SNARK proof dict (Groth16: {pi_a, pi_b,
        pi_c, publics}; fflonk: {C1, C2, W1, W2, evals, publics})."""
        r1cs, witness = build_final_r1cs(self.info, self.const_root_fr,
                                         proof)
        if self.protocol == "fflonk":
            return self._prove_fflonk(r1cs, witness)
        if self.key is None:
            self.key, self.toxic = setup(r1cs, seed=self.setup_seed)
        else:
            assert self.key.n_vars == r1cs.n_vars, \
                "R1CS shape changed across proofs"
        g16 = groth16.prove(self.key, witness)
        g16["publics"] = witness[1: r1cs.n_public + 1]
        # native pairing check (the reference CI's snarkjs-ffv role)
        from ..snark.pairing import groth16_verify, make_vk

        vk = make_vk(self.toxic, r1cs.n_public)
        assert groth16_verify(vk, g16), "final Groth16 proof fails pairing"
        g16["verified"] = True
        return g16

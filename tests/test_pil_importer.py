"""Import + compile the real compiled-PIL circuits from the reference tree
(structural: constants zeroed, no proving at 2^23 here)."""

import os

import pytest

MAIN_PIL = "/root/reference/src/main_sm/fork_5/scripts/main.pil.json"


@pytest.mark.skipif(not os.path.exists(MAIN_PIL),
                    reason="reference PIL not mounted")
def test_import_and_compile_zkevm_main_pil():
    from merlin_zkevm_prover_tpu.stark.compiler import compile_air
    from merlin_zkevm_prover_tpu.stark.pil_importer import import_pil

    air = import_pil(MAIN_PIL, name="zkevm")
    assert air.n_bits == 23
    assert len(air.cm_names) == 665
    # 218 PIL constants + row selectors for publics
    assert len(air.const_names) >= 218
    assert len(air.lookups) == 28
    assert len(air.permutations) == 18
    assert len(air.connections) == 2
    assert len(air.publics) == 44
    assert air.cm_names[0] != "cm0"  # names resolved from references

    info = compile_air(air, n_queries=32)
    # committed pols: 665 stage-1 + h1/h2 per lookup + num/den/z per
    # lookup/permutation; connections chain their 3-factor products
    # through 2 im pols per side (num/den) + z (compiler _chain_product)
    assert info.n_cm[0] == 665
    assert info.n_cm[1] == 2 * 28
    assert info.n_cm[2] == 3 * (28 + 18) + 2 * (2 * 2 + 1)
    assert info.q_deg >= 1
    assert info.n_bits_ext > info.n_bits
    assert len(info.ev_map) > 600
    # every stage-1 pol referenced by constraints appears in the evMap
    kinds = {k for (k, _, _) in info.ev_map}
    assert kinds == {"cm", "const", "q"}
